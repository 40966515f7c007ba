"""Wave-55 operators: record-rate stationarity, median order-stat CI."""

from __future__ import annotations

import datetime as dt

from ontology_mapper_spark.operators.stats import median_ci
from ontology_mapper_spark.operators.temporal import record_rate_test


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 1), 1, "t", float(v))
            for i, (d, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_record_rate_monotone_series_every_day_is_record(spark):
    rows = [(d, d * 1.0) for d in range(1, 11)]
    r = record_rate_test(_ev(spark, rows)).collect()[0]
    assert r["n_days"] == 10 and r["n_records"] == 10
    # H_10 ~ 2.929 -> strongly positive z
    assert abs(r["expected_micro"] - 2_928_968) <= 10
    assert r["z_milli"] > 4000


def test_record_rate_decreasing_one_record(spark):
    rows = [(d, float(20 - d)) for d in range(1, 11)]
    r = record_rate_test(_ev(spark, rows)).collect()[0]
    assert r["n_records"] == 1
    assert r["z_milli"] < 0


def test_median_ci_hand(spark):
    # n=9, values 1..9: md rank 5 -> 5; lo = ceil(4.5-2.94)=2, hi = floor(5.5+2.94)=8
    rows = [("g", v) for v in range(1, 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = median_ci(df, "g", "v").collect()[0]
    assert r["median"] == 5
    assert (r["lo_rank"], r["hi_rank"]) == (2, 8)
    assert (r["ci_lo"], r["ci_hi"]) == (2, 8)


def test_median_ci_narrows_with_n(spark):
    small = spark.createDataFrame([("g", v % 100) for v in range(30)], "g string, v long")
    big = spark.createDataFrame([("g", v % 100) for v in range(3000)], "g string, v long")
    rs = median_ci(small, "g", "v").collect()[0]
    rb = median_ci(big, "g", "v").collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < (rs["ci_hi"] - rs["ci_lo"])
    assert rs["ci_lo"] <= rs["median"] <= rs["ci_hi"]
