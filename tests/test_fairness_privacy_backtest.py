"""Unit tests for the qb70-qb72 wave: fairness audit gaps,
t-closeness EMD, seasonal-naive backtest — closed-form cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.evaluate import fairness_audit
from ontology_mapper_spark.operators.privacy import t_closeness_report
from ontology_mapper_spark.operators.temporal import seasonal_naive_backtest


def test_fairness_audit_gaps_and_di(spark):
    # group a: selects 4/4; group b: selects 1/4 -> global 5/8
    rows = [("a", 1, 1)] * 4 + [("b", 1, 1)] + [("b", 0, 0)] * 3
    df = spark.createDataFrame(rows, "g string, p int, y int")
    out = {
        r["g"]: r
        for r in fairness_audit(
            df, F.col("p") == 1, F.col("y") == 1, "g"
        ).collect()
    }
    assert out["a"]["sel_rate_micro"] == 1_000_000
    assert out["b"]["sel_rate_micro"] == 250_000
    assert out["a"]["dp_gap_micro"] == 1_000_000 - 625_000
    assert out["b"]["dp_gap_micro"] == 250_000 - 625_000
    # DI: b = 250000/625000 = 0.4 -> flagged; a = 1.6 -> not
    assert out["b"]["di_ratio_micro"] == 400_000
    assert out["b"]["di_flag"] == 1
    assert out["a"]["di_flag"] == 0
    # all of group a is positive-labeled: FPR undefined (fp+tn = 0)
    assert out["a"]["fpr_micro"] is None


def test_t_closeness_flags_concentrated_group(spark):
    # global: uniform over buckets 0..3; group "x" all in bucket 0
    rows = [("bg", i % 4) for i in range(400)] + [("x", 0)] * 100
    df = spark.createDataFrame(rows, "q string, b long")
    out = {
        r["q"]: r
        for r in t_closeness_report(df, ["q"], F.col("b"), 4).collect()
    }
    # group x: cum shares (1,1,1,1) vs global (.36,.52,.68,.84 ...)
    assert out["x"]["t_micro"] > out["bg"]["t_micro"]
    assert out["x"]["t_flag"] == 1
    # background group closely tracks global -> t at/below threshold
    # (its exact EMD vs the x-contaminated global is 0.1)
    assert out["bg"]["t_micro"] <= 100_000
    assert out["bg"]["t_flag"] == 0


def test_t_closeness_zero_when_identical(spark):
    rows = [("a", i % 3) for i in range(90)] + [
        ("b", i % 3) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "q string, b long")
    out = t_closeness_report(df, ["q"], F.col("b"), 3).collect()
    assert all(r["t_micro"] == 0 for r in out)
    assert all(r["t_flag"] == 0 for r in out)


def test_seasonal_backtest_perfect_weekly_pattern(spark):
    # perfectly 7-periodic counts: seasonal errors 0, naive errors > 0
    rows = []
    pattern = [5, 1, 1, 1, 1, 1, 9]
    for d in range(1, 29):  # 4 full weeks in january
        rows += [("t", datetime(2024, 1, d))] * pattern[(d - 1) % 7]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = seasonal_naive_backtest(df, "ts", "event_type").collect()[0]
    assert out["n_days"] == 28
    assert out["n_eval"] == 21  # days 8..28
    assert out["mae_milli"] == 0
    assert out["naive_mae_milli"] > 0
    assert out["mase_micro"] == 0
    assert out["beats_naive"] == 1


def test_seasonal_backtest_mase_above_one_for_antiperiodic(spark):
    # alternating 1,9 daily: naive error constant 8; seasonal (lag 7,
    # odd season) also 8 -> MASE exactly 1, does NOT beat naive
    rows = []
    for d in range(1, 22):
        rows += [("t", datetime(2024, 1, d))] * (1 if d % 2 else 9)
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = seasonal_naive_backtest(df, "ts", "event_type").collect()[0]
    assert out["mase_micro"] == 1_000_000
    assert out["beats_naive"] == 0
