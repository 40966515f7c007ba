"""Bucketized interval join: parity vs naive theta join, guard, plan."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ontology_mapper_spark.operators.intervaljoin import interval_point_join


def _mk(spark, n_points=200, n_iv=20):
    t0 = datetime(2026, 3, 1)
    pts = spark.createDataFrame(
        [(i % 5, i, t0 + timedelta(seconds=17 * i)) for i in range(n_points)],
        "k long, point_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (
                j % 5,
                j,
                t0 + timedelta(seconds=120 * j),
                t0 + timedelta(seconds=120 * j + 95),
            )
            for j in range(n_iv)
        ],
        "k long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    return pts, iv


def test_parity_with_naive_theta_join(spark):
    pts, iv = _mk(spark)
    got = sorted(
        (r["iv_id"], r["point_id"])
        for r in interval_point_join(
            pts, iv, keys=("k",), bucket_width_us=60_000_000
        ).collect()
    )
    naive = sorted(
        (r["iv_id"], r["point_id"])
        for r in iv.join(pts, "k")
        .where((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_boundary_points_inclusive(spark):
    t0 = datetime(2026, 3, 1)
    pts = spark.createDataFrame(
        [(1, t0), (2, t0 + timedelta(seconds=100)), (3, t0 - timedelta(microseconds=1))],
        "point_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(7, t0, t0 + timedelta(seconds=100))],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        r["point_id"]
        for r in interval_point_join(pts, iv, bucket_width_us=30_000_000).collect()
    )
    assert got == [1, 2]  # both endpoints inclusive, predecessor excluded


def test_bucket_explosion_guard_raises(spark):
    pts, iv = _mk(spark, n_points=4, n_iv=2)
    bad = interval_point_join(
        pts, iv, keys=("k",), bucket_width_us=1_000, max_buckets_per_interval=10
    )
    with pytest.raises(Exception, match="too many buckets"):
        bad.collect()


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, iv = _mk(spark)
    plan = (
        interval_point_join(pts, iv, keys=("k",), bucket_width_us=60_000_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
