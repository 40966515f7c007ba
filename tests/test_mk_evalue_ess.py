"""Unit tests for the qb87-qb89 wave: Mann-Kendall trend test,
E-value confounding audit, Kish effective sample size."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import (
    evalue_confounding,
    kish_ess,
)
from ontology_mapper_spark.operators.temporal import mann_kendall


def _daily(spark, counts):
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [("t", datetime(2024, 1, d))] * c
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_mann_kendall_monotone_series(spark):
    # strictly increasing 10-day series: S = 45 (all pairs +1),
    # no ties -> varnum = 10*9*25 = 2250, z = 44/sqrt(125) = 3.935
    df = _daily(spark, list(range(1, 11)))
    out = mann_kendall(df).collect()[0]
    assert out["s_stat"] == 45
    assert out["var_num_x18"] == 2250
    assert out["z_milli"] == 3935
    assert out["trend_flag"] == 1


def test_mann_kendall_flat_series_with_ties(spark):
    # constant series: S = 0, all 10 days in one tie group ->
    # varnum = 2250 - 10*9*25 = 0 -> z null, flag null
    df = _daily(spark, [4] * 10)
    out = mann_kendall(df).collect()[0]
    assert out["s_stat"] == 0
    assert out["var_num_x18"] == 0
    assert out["z_milli"] is None
    assert out["trend_flag"] is None


def test_mann_kendall_decreasing(spark):
    df = _daily(spark, list(range(10, 0, -1)))
    out = mann_kendall(df).collect()[0]
    assert out["s_stat"] == -45
    assert out["trend_flag"] == -1


def test_evalue_closed_form(spark):
    # one stratum: arm0 10/100, arm1 40/100 -> RR = 4,
    # E = 4 + sqrt(12) = 7.464102
    rows = [("s", 0, 1)] * 10 + [("s", 0, 0)] * 90
    rows += [("s", 1, 1)] * 40 + [("s", 1, 0)] * 60
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = {
        r["s"]: r
        for r in evalue_confounding(df, "arm", F.col("y") == 1, "s")
        .collect()
    }
    assert out["s"]["rr_micro"] == 4_000_000
    assert out["s"]["evalue_micro"] == 7_464_102
    # pooled row equals the single stratum here
    assert out["__pooled__"]["evalue_micro"] == 7_464_102


def test_evalue_protective_ratio_inverts(spark):
    # RR = 0.25 -> RR* = 4 -> same E as RR = 4 (symmetry)
    rows = [("s", 0, 1)] * 40 + [("s", 0, 0)] * 60
    rows += [("s", 1, 1)] * 10 + [("s", 1, 0)] * 90
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = evalue_confounding(df, "arm", F.col("y") == 1, "s").collect()
    row = [r for r in out if r["s"] == "s"][0]
    assert row["rr_micro"] == 250_000
    assert row["evalue_micro"] == 7_464_102


def test_kish_ess_bounds(spark):
    # equal weights -> ESS = n exactly, ratio 1
    eq = spark.createDataFrame(
        [(10, 1_000_000), (30, 1_000_000)], "n long, w long"
    )
    out = kish_ess(eq, "n", "w").collect()[0]
    assert out["n_units"] == 40
    assert out["ess_milli"] == 40_000
    assert out["ess_ratio_micro"] == 1_000_000
    # one unit hogging all weight -> ESS collapses toward that unit
    skew = spark.createDataFrame(
        [(1, 10_000_000), (99, 1)], "n long, w long"
    )
    out2 = kish_ess(skew, "n", "w").collect()[0]
    assert out2["ess_ratio_micro"] < 150_000
