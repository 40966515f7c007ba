"""Unit tests for the qb96-qb98 wave: Wasserstein-1 distance,
Ljung-Box whiteness, Wald-Wolfowitz runs test."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import wasserstein_1d
from ontology_mapper_spark.operators.temporal import (
    ljung_box,
    runs_test_daily,
)


def test_wasserstein_point_masses(spark):
    # A all at 0, B all at 70 -> W1 = 70 exactly (7000 milli... 70000)
    rows = [(0, 0)] * 10 + [(70, 1)] * 10
    df = spark.createDataFrame(rows, "v long, b long")
    out = wasserstein_1d(df, "v", F.col("b") == 1).collect()[0]
    assert out["w1_milli"] == 70_000
    assert out["n_a"] == 10 and out["n_b"] == 10


def test_wasserstein_identical_zero(spark):
    rows = [(v, s) for v in (1, 5, 9) for s in (0, 1) for _ in range(4)]
    df = spark.createDataFrame(rows, "v long, b long")
    out = wasserstein_1d(df, "v", F.col("b") == 1).collect()[0]
    assert out["w1_milli"] == 0


def test_wasserstein_translation(spark):
    # B = A shifted by +3 -> W1 = 3
    a = [(v, 0) for v in (10, 20, 30, 40)]
    b = [(v + 3, 1) for v in (10, 20, 30, 40)]
    df = spark.createDataFrame(a + b, "v long, b long")
    out = wasserstein_1d(df, "v", F.col("b") == 1).collect()[0]
    assert out["w1_milli"] == 3_000


def _daily_events(spark, counts):
    rows = []
    eid = 0
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, d), 1, "t"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_ljung_box_detects_momentum(spark):
    # strongly autocorrelated ramp vs an alternating series
    ramp = _daily_events(spark, [i * 3 + 1 for i in range(20)])
    out = ljung_box(ramp, "event_type", "ts").collect()[0]
    assert out["q_milli"] is not None
    assert out["signif_flag"] == 1
    alt = _daily_events(spark, [2 if i % 2 else 9 for i in range(20)])
    out2 = ljung_box(alt, "event_type", "ts").collect()[0]
    # alternating series has huge NEGATIVE acf1 -> Q is also large
    # (Ljung-Box is two-sided); just check it computed
    assert out2["q_milli"] is not None


def test_runs_test_oscillation_vs_trend(spark):
    # perfectly alternating moves: maximal runs -> strongly positive z
    alt = _daily_events(spark, [2 if i % 2 else 9 for i in range(21)])
    out = runs_test_daily(alt, "event_type", "ts").collect()[0]
    assert out["n_runs"] == out["n_moves"]  # every move flips
    assert out["z_milli"] > 1960 and out["signif_flag"] == 1
    # monotone ramp: all ups, runs test undefined (n_down = 0) -> null
    ramp = _daily_events(spark, [i + 1 for i in range(15)])
    out2 = runs_test_daily(ramp, "event_type", "ts").collect()[0]
    assert out2["n_down"] == 0
    assert out2["z_milli"] is None
    # two long blocks (down-block then up-block): few runs -> negative z
    blocks = _daily_events(
        spark, [20, 18, 16, 14, 12, 10, 12, 14, 16, 18, 20, 22, 24]
    )
    out3 = runs_test_daily(blocks, "event_type", "ts").collect()[0]
    assert out3["n_runs"] == 2
    assert out3["z_milli"] < 0
