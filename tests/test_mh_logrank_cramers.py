"""Unit tests for the qb90-qb92 wave: Mantel-Haenszel pooled ratio,
log-rank test, Cramer's V — closed-form cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import (
    cramers_v,
    logrank_test,
    mantel_haenszel_rr,
)


def test_mh_corrects_simpsons_textbook_case(spark):
    # the qb86 textbook paradox: crude RR < 1 but both strata favor
    # arm 1; MH must land ABOVE 1 (stratum-weighted truth)
    rows = []
    rows += [("A", 0, 1)] * 50 + [("A", 0, 0)] * 50
    rows += [("A", 1, 1)] * 60 + [("A", 1, 0)] * 40
    rows += [("B", 0, 1)] * 5 + [("B", 0, 0)] * 95
    rows += [("B", 1, 1)] * 100 + [("B", 1, 0)] * 800
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = mantel_haenszel_rr(df, "arm", F.col("y") == 1, "s").collect()[0]
    assert out["n_strata"] == 2
    assert out["crude_rr_micro"] < 1_000_000  # confounded read
    assert out["rr_mh_micro"] > 1_000_000  # corrected read
    # exact: num = round(60*100*1e6/200) + round(100*100*1e6/1000)
    #        den = round(50*100*1e6/200) + round(5*900*1e6/1000)
    num = 60 * 100 * 1_000_000 // 200 + 100 * 100 * 1_000_000 // 1000
    den = 50 * 100 * 1_000_000 // 200 + 5 * 900 * 1_000_000 // 1000
    assert out["num_micro_sum"] == num
    assert out["den_micro_sum"] == den


def test_logrank_identical_groups_z_zero(spark):
    # both groups share the same duration multiset -> O1 tracks E1
    rows = []
    for t in (1, 2, 3, 4, 5):
        rows += [(t, True, 0), (t, True, 1)]
    df = spark.createDataFrame(rows, "t long, e boolean, grp long")
    out = logrank_test(df, "t", "e", "grp").collect()[0]
    assert out["o1"] == 5
    # E1 = sum d*n1/n with perfect symmetry = half the deaths
    assert out["e1_micro"] == 5_000_000
    assert out["z_milli"] == 0
    assert out["signif_flag"] == 0


def test_logrank_separated_groups_significant(spark):
    # group 0 all dies early (t=1..10), group 1 all dies late
    # (t=101..110): maximal separation
    rows = [(t, True, 0) for t in range(1, 11)]
    rows += [(t, True, 1) for t in range(101, 111)]
    df = spark.createDataFrame(rows, "t long, e boolean, grp long")
    out = logrank_test(df, "t", "e", "grp").collect()[0]
    assert out["signif_flag"] == 1
    # group 1 dies LATE -> observed early deaths in group 1 fall short
    # of expected -> strongly negative z
    assert out["z_milli"] < -3000


def test_cramers_v_extremes(spark):
    # perfect association: row fully determines column -> V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = cramers_v(df, "r", "c").collect()[0]
    assert out["v_micro"] == 1_000_000
    # independence: uniform grid -> chi2 = 0, V = 0
    rows2 = [(r, c) for r in ("a", "b") for c in ("x", "y")] * 5
    df2 = spark.createDataFrame(rows2, "r string, c string")
    out2 = cramers_v(df2, "r", "c").collect()[0]
    assert out2["chi2_micro"] == 0
    assert out2["v_micro"] == 0
