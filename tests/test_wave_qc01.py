"""Wave-41 operators: ERR cascade, MRR, Good-Turing richness."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.evaluate import err_at_k, mrr_at_k
from ontology_mapper_spark.operators.textstats import good_turing_richness


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "q long, rank long, rel long")


def test_err_perfect_first_hit_dominates(spark):
    # q=1: perfect grade at rank 1; q=2: same grade buried at rank 5
    rows = [(1, 1, 2)] + [(1, r, 0) for r in range(2, 6)]
    rows += [(2, r, 0) for r in range(1, 5)] + [(2, 5, 2)]
    out = {
        r["q"]: r["err_micro"]
        for r in err_at_k(_ranked(spark, rows), "q", "rank", "rel").collect()
    }
    # R(2) = 3/4 -> ERR for rank-1 hit = 3/4 = 750000 micro exactly
    assert out[1] == 750_000
    # buried hit: (1/5) * 3/4 = 150000 micro exactly
    assert out[2] == 150_000
    assert out[1] > out[2]


def test_err_cascade_discounts_after_strong_hit(spark):
    # grade-2 at rank 1 followed by grade-2 at rank 2:
    # ERR = 3/4 + (1/2)(1/4)(3/4) = 0.84375
    rows = [(1, 1, 2), (1, 2, 2), (1, 3, 0), (1, 4, 0), (1, 5, 0)]
    row = err_at_k(_ranked(spark, rows), "q", "rank", "rel").collect()[0]
    assert row["err_micro"] == 843_750
    # exact integer numerator: scale 60 * 4^5 = 61440
    assert row["err_num"] == 51_840


def test_err_bounds_zero_and_one(spark):
    rows = [(1, r, 0) for r in range(1, 6)]
    row = err_at_k(_ranked(spark, rows), "q", "rank", "rel").collect()[0]
    assert row["err_micro"] == 0 and row["err_num"] == 0


def test_mrr_exact_reciprocals_and_miss(spark):
    rows = [(1, 1, 2), (1, 2, 0), (2, 1, 0), (2, 3, 2), (3, 2, 1)]
    out = {
        r["q"]: (r["first_rank"], r["rr_num"], r["mrr_micro"])
        for r in mrr_at_k(
            _ranked(spark, rows), "q", "rank", "rel", k=10
        ).collect()
    }
    assert out[1][0] == 1 and out[1][1] == 2520
    assert out[2][0] == 3 and out[2][1] == 840
    assert out[3][0] is None and out[3][1] == 0  # grade-1 < threshold
    # MRR = (1 + 1/3 + 0) / 3 = 4/9 -> 444444 micro
    assert out[1][2] == 444_444


def test_good_turing_hand_counts(spark):
    df = spark.createDataFrame(
        [("a", "x x y z"), ("a", "w"), ("b", "p p p")],
        "source string, text string",
    )
    out = {
        r["source"]: r
        for r in good_turing_richness(df, "source", "text").collect()
    }
    a = out["a"]
    # tokens: x x y z w -> N=5 V=4 N1=3 (y,z,w) N2=1 (x)
    assert (a["n_tokens"], a["v_types"]) == (5, 4)
    assert (a["n1_singletons"], a["n2_doubletons"]) == (3, 1)
    assert a["p0_micro"] == 600_000  # 3/5
    # chao1 = 4 + 3*2/(2*2) = 5.5
    assert a["chao1_micro"] == 5_500_000
    assert a["hapax_share_micro"] == 750_000
    b = out["b"]
    assert b["p0_micro"] == 0 and b["chao1_micro"] == 1_000_000


def test_good_turing_chao1_at_least_observed(spark):
    df = spark.createDataFrame(
        [("s", f"w{i % 7} w{i % 3}") for i in range(40)],
        "source string, text string",
    )
    row = good_turing_richness(df, "source", "text").collect()[0]
    assert row["chao1_micro"] >= row["v_types"] * 1_000_000
    assert 0 <= row["p0_micro"] <= 1_000_000
