"""Wave-51 operators: Hellinger/TV, Dunn post-hoc, partial correlation."""

from __future__ import annotations

from ontology_mapper_spark.operators.stats import (
    dunn_posthoc,
    hellinger_tv,
    partial_correlation,
)


def test_hellinger_identical_distributions_zero(spark):
    rows = [(v, s) for v in (1, 2, 3, 4) for s in (True, False)]
    df = spark.createDataFrame(rows, "v long, b boolean")
    r = hellinger_tv(df, "v", "b").collect()[0]
    assert r["tv_micro"] == 0
    assert r["hellinger_micro"] == 0
    assert r["bc_nano"] == 1_000_000_000


def test_hellinger_disjoint_supports_one(spark):
    rows = [(v, False) for v in (1, 2)] + [(v, True) for v in (10, 11)]
    df = spark.createDataFrame(rows, "v long, b boolean")
    r = hellinger_tv(df, "v", "b").collect()[0]
    assert r["tv_micro"] == 1_000_000
    assert r["hellinger_micro"] == 1_000_000
    assert r["bc_nano"] == 0


def test_hellinger_half_overlap_hand(spark):
    # A uniform on {1,2}, B uniform on {2,3}: BC = sqrt(.5*.5) = 0.5
    rows = [(1, False), (2, False), (2, True), (3, True)]
    df = spark.createDataFrame(rows, "v long, b boolean")
    r = hellinger_tv(df, "v", "b").collect()[0]
    assert r["bc_nano"] == 500_000_000
    # H = sqrt(1 - 0.5) = 0.7071; TV = 0.5
    assert abs(r["hellinger_micro"] - 707_107) <= 1
    assert r["tv_micro"] == 500_000


def test_dunn_separated_pair_significant(spark):
    rows = [("a", v) for v in range(100)]
    rows += [("b", v + 1000) for v in range(100)]
    rows += [("c", v) for v in range(100)]  # same as a
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r["group_a"], r["group_b"]): r for r in dunn_posthoc(df, "g", "v").collect()}
    assert out[("a", "b")]["significant"] is True
    assert out[("a", "b")]["z_milli"] < 0  # a's ranks lower
    assert out[("a", "c")]["significant"] is False
    assert abs(out[("a", "c")]["z_milli"]) <= 1  # tied midranks
    assert len(out) == 3


def test_partial_correlation_confounder_removed(spark):
    # x and y both driven by z, no direct link: partial ~ 0, raw high
    rows = [
        (z + (i % 5), z + ((i // 5) % 5), z)
        for i, z in enumerate(range(0, 300, 3))
    ]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy_micro"] > 900_000         # confounded: looks correlated
    assert abs(r["partial_r_micro"]) < 200_000  # mostly explained by z


def test_partial_correlation_direct_link_survives(spark):
    # y = x + noise, z independent: partial ~ raw
    rows = [(i % 50, (i % 50) * 2 + (i % 3), (i * 13) % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    r = partial_correlation(df, "x", "y", "z").collect()[0]
    assert r["r_xy_micro"] > 990_000
    assert r["partial_r_micro"] > 990_000
