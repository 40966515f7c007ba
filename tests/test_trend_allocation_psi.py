"""Unit tests for the qb67-qb69 wave: Theil-Sen robust trend,
session time-in-hour allocation (conservation), PSI drift — the
closed-form edge cases the sf-scale oracles don't isolate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import psi_drift
from ontology_mapper_spark.operators.temporal import (
    theil_sen_daily,
    time_in_hour_buckets,
)


def _ts(day: int, h: int = 0, mi: int = 0) -> datetime:
    return datetime(2024, 1, day, h, mi)


def test_theil_sen_resists_one_outlier_day(spark):
    # days 1..7 with counts 1,2,3,4,5,6,100: OLS gets dragged, the
    # pairwise-slope median stays near the true slope of 1.
    rows = []
    counts = [1, 2, 3, 4, 5, 6, 100]
    for d, c in enumerate(counts, start=1):
        rows += [("t", _ts(d))] * c
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = theil_sen_daily(df, "ts", "event_type").collect()[0]
    assert out["n_days"] == 7
    assert out["ts_slope_milli"] == 1000  # exact median slope = 1/day
    assert out["ols_slope_milli"] > 5000  # OLS blown up by the outlier
    # intercept: residual median of 1000*y - 1000*d with d0-based days
    assert out["ts_intercept_milli"] == 1000


def test_theil_sen_exact_line_recovered(spark):
    # y = 3 + 2d exactly: slope 2000 milli, intercept 3000 milli,
    # OLS agrees.
    rows = []
    for d in range(1, 6):
        rows += [("t", _ts(d))] * (3 + 2 * (d - 1))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = theil_sen_daily(df, "ts", "event_type").collect()[0]
    assert out["ts_slope_milli"] == 2000
    assert out["ts_intercept_milli"] == 3000
    assert out["ols_slope_milli"] == 2000


def test_hour_allocation_conserves_session_time(spark):
    # one session crossing two hour boundaries + one point session
    df = spark.createDataFrame(
        [
            (1, _ts(1, 10, 50)),  # session a: 10:50 .. 12:10
            (1, _ts(1, 11, 15)),
            (1, _ts(1, 11, 40)),
            (1, _ts(1, 12, 10)),
            (2, _ts(1, 5, 0)),  # point session: 0 micros
        ],
        "user_id long, ts timestamp",
    )
    out = {
        r["hour_of_day"]: r
        for r in time_in_hour_buckets(df, "ts", "user_id").collect()
    }
    # session a spans 80 min: 10 min in hour 10, 60 in 11, 10 in 12
    assert out[10]["total_micros"] == 10 * 60_000_000
    assert out[11]["total_micros"] == 60 * 60_000_000
    assert out[12]["total_micros"] == 10 * 60_000_000
    assert out[5]["total_micros"] == 0
    assert out[5]["n_sessions"] == 1
    total = sum(r["total_micros"] for r in out.values())
    assert total == 80 * 60_000_000  # conservation

    # gap rule: >30 min between user-1 events would split; all gaps
    # here are <=35? (25, 25, 30) -> one session per user
    assert all(r["n_sessions"] == 1 for r in out.values())


def test_hour_allocation_conservation_random(spark):
    # conservation holds on a messier corpus: sum over hours equals
    # the summed session durations computed independently
    rows = [
        (u, datetime(2024, 1, 1 + (i * 7 * u) % 3, (i * 5) % 24,
                     (i * 13) % 60))
        for u in (1, 2, 3)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = time_in_hour_buckets(df, "ts", "user_id")
    total = out.agg(F.sum("total_micros")).collect()[0][0]
    # independent session durations via the same gap rule
    ev = df.select(
        "user_id", F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t")
    sess = (
        ev.withColumn(
            "new",
            F.when(
                F.col("t") - F.lag("t").over(w) > 1_800_000_000, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg((F.max("t") - F.min("t")).alias("dur"))
    )
    expected = sess.agg(F.sum("dur")).collect()[0][0]
    assert total == expected


def test_psi_zero_on_identical_and_flags_shift(spark):
    # identical halves -> every term 0 -> level 0
    rows = [(i, 100 + (i % 5) * 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = psi_drift(
        df, "n_chars", F.col("doc_id") % 2 == 1, bin_width=100, n_bins=10
    ).collect()
    assert all(r["term_micro"] == 0 for r in out)
    assert out[0]["psi_total_micro"] == 0
    assert out[0]["drift_level"] == 0
    assert len(out) == 10  # full spine even where both sides empty

    # hard shift: baseline all in bin 1, current all in bin 8
    rows2 = [(i, 150 if i % 2 == 0 else 850) for i in range(200)]
    df2 = spark.createDataFrame(rows2, "doc_id long, n_chars long")
    out2 = psi_drift(
        df2, "n_chars", F.col("doc_id") % 2 == 1, bin_width=100, n_bins=10
    ).collect()
    assert out2[0]["psi_total_micro"] > 250_000
    assert out2[0]["drift_level"] == 2
