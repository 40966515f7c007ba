"""Tests for the qa98-qa99 wave: KMV set operations and the
randomization test."""

from __future__ import annotations

from ontology_mapper_spark.operators.sketch import kmv_set_ops
from ontology_mapper_spark.operators.stats import randomization_test_means

MICRO = 1_000_000


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_identical_groups_estimate_full_overlap(spark):
    rows = [("a", f"w{i}") for i in range(30)] + [
        ("b", f"w{i}") for i in range(30)
    ]
    out = kmv_set_ops(_vals(spark, rows), "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("a", "b")
    # < k distinct union values: sketch is exhaustive -> exact answers
    assert r.n_sketch == 30 and r.union_est == 30
    assert r.n_matched == 30 and r.jaccard_micro == MICRO
    assert r.inter_est == 30


def test_kmv_disjoint_groups_estimate_zero_overlap(spark):
    rows = [("a", f"x{i}") for i in range(20)] + [
        ("b", f"y{i}") for i in range(20)
    ]
    r = kmv_set_ops(_vals(spark, rows), "g", "v", k=64).collect()[0]
    assert r.n_sketch == 40 and r.union_est == 40
    assert r.n_matched == 0 and r.jaccard_micro == 0 and r.inter_est == 0


def test_kmv_partial_overlap_is_exact_below_k(spark):
    # |A|=40, |B|=40, |A∩B|=20 -> union 60, all under k=64: exact
    rows = [("a", f"c{i}") for i in range(20)]
    rows += [("a", f"xa{i}") for i in range(20)]
    rows += [("b", f"c{i}") for i in range(20)]
    rows += [("b", f"xb{i}") for i in range(20)]
    r = kmv_set_ops(_vals(spark, rows), "g", "v", k=64).collect()[0]
    assert r.union_est == 60 and r.n_matched == 20
    assert r.jaccard_micro == round(20 * MICRO / 60)
    assert r.inter_est == 20


def test_kmv_large_groups_estimate_within_tolerance(spark):
    # 3000-value union, true jaccard 1/3 — sketch (k=128) should land
    # within a loose tolerance (deterministic: exact assertion fails only
    # if the md5 family is biased, which the tolerance bounds)
    rows = [("a", f"c{i}") for i in range(1000)]
    rows += [("a", f"xa{i}") for i in range(1000)]
    rows += [("b", f"c{i}") for i in range(1000)]
    rows += [("b", f"xb{i}") for i in range(1000)]
    r = kmv_set_ops(_vals(spark, rows), "g", "v", k=128).collect()[0]
    assert 2200 <= r.union_est <= 3800
    assert 150_000 <= r.jaccard_micro <= 550_000


def test_kmv_pairs_cover_all_group_combinations(spark):
    rows = [(g, f"{g}{i}") for g in ("a", "b", "c") for i in range(5)]
    out = kmv_set_ops(_vals(spark, rows), "g", "v", k=8).collect()
    assert {(r.group_a, r.group_b) for r in out} == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }


def _docs(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, id long")


def test_randomization_big_difference_small_p(spark):
    rows = [("A", 1000 + (i % 7), i) for i in range(60)]
    rows += [("B", 10 + (i % 5), 1000 + i) for i in range(60)]
    r = randomization_test_means(
        _docs(spark, rows), "g", "x", "id", "A", "B", n_reps=100
    ).collect()[0]
    assert r.n_a == 60 and r.n_b == 60 and r.n_reps == 100
    assert r.diff_obs_micro > 900 * MICRO
    # a 100x mean gap should never be matched by reshuffles
    assert r.n_extreme <= 2
    assert r.p_value_micro == round((r.n_extreme + 1) * MICRO / 101)


def test_randomization_null_difference_large_p(spark):
    rows = [("A", 50 + (i % 11), i) for i in range(80)]
    rows += [("B", 50 + ((i + 3) % 11), 1000 + i) for i in range(80)]
    r = randomization_test_means(
        _docs(spark, rows), "g", "x", "id", "A", "B", n_reps=100
    ).collect()[0]
    assert r.p_value_micro > 100_000  # nowhere near significant


def test_randomization_is_deterministic(spark):
    rows = [("A", 10 * i, i) for i in range(30)] + [
        ("B", 7 * i, 100 + i) for i in range(30)
    ]
    d = _docs(spark, rows)
    a = randomization_test_means(d, "g", "x", "id", "A", "B", n_reps=50).collect()[0]
    b = randomization_test_means(d, "g", "x", "id", "A", "B", n_reps=50).collect()[0]
    assert a.asDict() == b.asDict()
