"""Unit tests for qb99/qc00: odds ratio with Woolf CI, daily value
bands."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import odds_ratio_ci
from ontology_mapper_spark.operators.temporal import daily_value_bands


def test_odds_ratio_signif_and_null_cases(spark):
    # stratum "big": arm1 strongly enriched -> OR >> 1, CI excludes 1
    rows = [("big", 0, 1)] * 10 + [("big", 0, 0)] * 90
    rows += [("big", 1, 1)] * 60 + [("big", 1, 0)] * 40
    # stratum "flat": identical arms -> OR ~ 1, CI straddles 1
    rows += [("flat", 0, 1)] * 30 + [("flat", 0, 0)] * 70
    rows += [("flat", 1, 1)] * 30 + [("flat", 1, 0)] * 70
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = {
        r["s"]: r
        for r in odds_ratio_ci(df, "arm", F.col("y") == 1, "s").collect()
    }
    assert out["big"]["or_micro"] > 5_000_000
    assert out["big"]["ci_lo_micro"] > 1_000_000
    assert out["big"]["signif_flag"] == 1
    assert out["flat"]["ci_lo_micro"] < 1_000_000 < out["flat"]["ci_hi_micro"]
    assert out["flat"]["signif_flag"] == 0


def test_odds_ratio_zero_cell_finite(spark):
    # zero cell: arm0 has no positives -> Haldane keeps OR finite
    rows = [("z", 0, 0)] * 50 + [("z", 1, 1)] * 10 + [("z", 1, 0)] * 40
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = odds_ratio_ci(df, "arm", F.col("y") == 1, "s").collect()[0]
    assert out["or_micro"] is not None
    assert out["ci_hi_micro"] > out["or_micro"] > out["ci_lo_micro"]


def test_daily_value_bands_exact_percentiles(spark):
    # one day, values 1..100 cents -> p10=10, p50=50, p90=90
    rows = [
        (i, datetime(2024, 1, 1, 1), 1, "t", i / 100.0)
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = daily_value_bands(df, "ts", "value").collect()[0]
    assert out["n_events"] == 100
    assert out["p10_cents"] == 10
    assert out["p50_cents"] == 50
    assert out["p90_cents"] == 90


def test_daily_value_bands_per_day_isolation(spark):
    rows = [(1, datetime(2024, 1, 1), 1, "t", 1.0)] + [
        (2, datetime(2024, 1, 2), 1, "t", 9.0)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r["day"]: r for r in daily_value_bands(df).collect()}
    assert out["2024-01-01"]["p50_cents"] == 100
    assert out["2024-01-02"]["p50_cents"] == 900
