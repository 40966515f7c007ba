"""Wave-42 operators: Kruskal-Wallis, Friedman, Cliff's delta."""

from __future__ import annotations

from ontology_mapper_spark.operators.stats import (
    cliffs_delta,
    friedman_test,
    kruskal_wallis,
)


def test_kruskal_wallis_hand_two_groups(spark):
    # a=[1,2], b=[3,4]: R_a=3, R_b=7, H = 12*29/20 - 15 = 2.4
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], "g string, v long"
    )
    rows = kruskal_wallis(df, "g", "v").collect()
    assert rows[0]["h_milli"] == 2400
    assert rows[0]["n_total"] == 4 and rows[0]["k_groups"] == 2
    # no ties -> correction is identity
    assert rows[0]["h_tie_milli"] == 2400
    by = {r["g"]: r for r in rows}
    assert by["a"]["r2"] == 6 and by["b"]["r2"] == 14


def test_kruskal_wallis_ties_corrected(spark):
    # a=[1,1], b=[2,2]: dmids v=1 -> 3, v=2 -> 7; R2_a=6, R2_b=14
    # raw H = (3*36/ (2*4*5)) + (3*196/(2*4*5)) /1e6... = 2.4 - wait:
    # S/1e6 = (0.9 + 4.9) ... compute: 3*36*1e6/(2*4*5)=2.7e6,
    # 3*196*1e6/40=14.7e6 -> h = 17.4 - 15 = 2.4; T = 2*(8-2)=12,
    # N^3-N = 60 -> h_tie = 2.4/(1-12/60) = 3.0
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2)], "g string, v long"
    )
    row = kruskal_wallis(df, "g", "v").collect()[0]
    assert row["h_milli"] == 2400
    assert row["h_tie_milli"] == 3000


def test_kruskal_wallis_identical_groups_near_zero(spark):
    df = spark.createDataFrame(
        [("a", v) for v in range(10)] + [("b", v) for v in range(10)],
        "g string, v long",
    )
    row = kruskal_wallis(df, "g", "v").collect()[0]
    # identical distributions: H ~ 0 (micro-rounding only)
    assert abs(row["h_milli"]) <= 1


def test_friedman_perfect_ordering(spark):
    # 2 blocks, 3 treatments, t3 > t2 > t1 in both -> chi2 = 4 (max)
    rows = [
        (1, "t1", 10), (1, "t2", 20), (1, "t3", 30),
        (2, "t1", 5), (2, "t2", 6), (2, "t3", 7),
    ]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    out = friedman_test(df, "b", "t", "v").collect()
    assert out[0]["chi2_milli"] == 4000
    assert out[0]["n_blocks"] == 2 and out[0]["k_treatments"] == 3
    by = {r["t"]: r["r2"] for r in out}
    assert by["t1"] == 4 and by["t2"] == 8 and by["t3"] == 12


def test_friedman_incomplete_block_dropped(spark):
    rows = [
        (1, "t1", 10), (1, "t2", 20), (1, "t3", 30),
        (2, "t1", 5), (2, "t2", 6), (2, "t3", 7),
        (3, "t1", 1),  # incomplete block: dropped
    ]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    out = friedman_test(df, "b", "t", "v").collect()
    assert out[0]["n_blocks"] == 2 and out[0]["chi2_milli"] == 4000


def test_cliffs_delta_total_separation(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], "g string, v long"
    )
    by = {r["g"]: r for r in cliffs_delta(df, "g", "v").collect()}
    assert by["a"]["delta_micro"] == -1_000_000
    assert by["b"]["delta_micro"] == 1_000_000
    assert by["a"]["magnitude"] == "large"


def test_cliffs_delta_identical_negligible(spark):
    df = spark.createDataFrame(
        [("a", v) for v in range(10)] + [("b", v) for v in range(10)],
        "g string, v long",
    )
    by = {r["g"]: r for r in cliffs_delta(df, "g", "v").collect()}
    assert by["a"]["delta_micro"] == 0
    assert by["a"]["magnitude"] == "negligible"
