"""Unit tests for the survival/advisor wave (qa67–qa71 operators):
Kaplan-Meier, join-strategy advisor, Benford deviation, daily ACF,
Neyman allocation — closed-form edge cases."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.skew import (
    join_side_stats,
    join_strategy_advisor,
)
from ontology_mapper_spark.operators.split import neyman_allocation
from ontology_mapper_spark.operators.stats import (
    benford_deviation,
    kaplan_meier,
)
from ontology_mapper_spark.operators.temporal import acf_daily


def test_kaplan_meier_textbook(spark):
    # durations: events at 2 (1 death of 5 at risk), 4 (1 death of 3);
    # censored at 3 and 5; plus a second subject at 2 censored.
    rows = [
        (2, True), (2, False), (3, False), (4, True), (5, False),
    ]
    df = spark.createDataFrame(rows, "t bigint, e boolean")
    out = {r["duration"]: r for r in kaplan_meier(df, "t", "e").collect()}
    assert set(out) == {2, 4}
    r2 = out[2]
    assert r2["n_at_risk"] == 5 and r2["n_events"] == 1
    assert r2["n_censored_here"] == 1
    # S(2) = 4/5
    assert abs(r2["survival_micro"] - 800_000) <= 1
    r4 = out[4]
    assert r4["n_at_risk"] == 2  # 5 - (2 at t=2) - (1 at t=3)
    # S(4) = 4/5 * 1/2
    assert abs(r4["survival_micro"] - 400_000) <= 1


def test_kaplan_meier_risk_set_dies_out(spark):
    df = spark.createDataFrame(
        [(1, True), (1, True), (2, True)], "t bigint, e boolean"
    )
    out = {r["duration"]: r for r in kaplan_meier(df, "t", "e").collect()}
    assert out[1]["survival_micro"] == round(1e6 / 3)
    assert out[2]["survival_micro"] == 0  # d == n at t=2
    assert out[2]["ln_s_micro"] is None


def test_benford_spine_and_chi2(spark):
    # 'a': perfectly Benford-ish impossible with 10 rows; use a known
    # contrived set: all values start with digit 1 → huge chi2, and
    # digits 2..9 must still appear with n_obs=0.
    df = spark.createDataFrame(
        [("a", 10 ** (i % 3) * 1) for i in range(9)], "g string, v bigint"
    )
    out = benford_deviation(df, "g", "v").collect()
    assert len(out) == 9
    byd = {r["digit"]: r for r in out}
    assert byd[1]["n_obs"] == 9 and byd[2]["n_obs"] == 0
    assert byd[2]["expected_micro"] == 9 * 176091
    total = sum(r["chi2_term_micro"] for r in out)
    assert byd[5]["chi2_total_micro"] == total
    # closed form: sum over digits of (o - 9p)^2/(9p) in micro
    want = sum(
        ((9 if d == 1 else 0) - 9 * p / 1e6) ** 2 / (9 * p / 1e6)
        for d, p in zip(
            range(1, 10),
            (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757),
        )
    )
    assert abs(total / 1e6 - want) < 0.01


def test_acf_alternating_series(spark):
    # daily counts 1,3,1,3,... → lag-1 ACF = -1, lag-2 ACF = +1 (for
    # the circular ideal; finite-sample values are close but exact in
    # closed form — compute the same closed form here).
    base = datetime(2024, 1, 1)
    rows = []
    ys = [1, 3] * 10
    for i, y in enumerate(ys):
        rows += [("t", base + timedelta(days=i))] * y
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = acf_daily(df, "event_type").collect()[0]
    n = len(ys)
    ybar = sum(ys) / n
    den = sum((y - ybar) ** 2 for y in ys)

    def ref(k):
        return round(
            sum(
                (ys[i] - ybar) * (ys[i - k] - ybar) for i in range(k, n)
            )
            / den
            * 1e6
        )

    assert out["n_days"] == n
    assert abs(out["acf1_micro"] - ref(1)) <= 1
    assert abs(out["acf2_micro"] - ref(2)) <= 1
    assert abs(out["acf3_micro"] - ref(3)) <= 1


def test_acf_constant_series_null(spark):
    base = datetime(2024, 1, 1)
    rows = [("t", base + timedelta(days=i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = acf_daily(df, "event_type").collect()[0]
    assert out["acf1_micro"] is None


def test_neyman_allocation_proportional_to_n_sigma(spark):
    # stratum a: values {0, 10} ×5 → var 250/9... use simple: a has
    # spread, b is constant (weight 0) → all budget to a.
    rows = [("a", 0), ("a", 10)] * 5 + [("b", 7)] * 10
    df = spark.createDataFrame(rows, "h string, v bigint")
    out = {r["h"]: r for r in neyman_allocation(df, "h", "v", 1000).collect()}
    assert out["b"]["weight_micro"] == 0 and out["b"]["alloc_n"] == 0
    assert out["a"]["alloc_n"] == 1000
    var_a = (10 * 25 - 50 * 50 / 10) / 9  # Σv²=250... values 0/10: Σv²=500
    var_a = (500 - 50 * 50 / 10) / 9
    assert out["a"]["var_micro"] == round(var_a * 1e6)
    assert out["a"]["weight_micro"] == round(10 * math.sqrt(var_a) * 1e6)


def test_join_advisor_three_strategies(spark):
    small = spark.createDataFrame(
        [(i, "x" * 10) for i in range(10)], "k bigint, s string"
    )
    # big + skewed: 3000 rows, one key holds 40%
    big_skew = spark.createDataFrame(
        [(0 if i < 1200 else i, "y" * 40) for i in range(3000)],
        "k bigint, s string",
    )
    big_flat = spark.createDataFrame(
        [(i, "y" * 40) for i in range(3000)], "k bigint, s string"
    )
    out = {
        r["table_name"]: r
        for r in join_strategy_advisor(
            [
                join_side_stats(small, "small", "k"),
                join_side_stats(big_skew, "big_skew", "k"),
                join_side_stats(big_flat, "big_flat", "k"),
            ],
            broadcast_bytes=1000,
        ).collect()
    }
    assert out["small"]["strategy"] == "broadcast"
    assert out["small"]["est_bytes"] == 10 * (10 + 8)
    assert out["big_skew"]["strategy"] == "salted-shuffle"
    assert out["big_skew"]["max_key_rows"] == 1200
    assert out["big_skew"]["hot_share_micro"] == 400_000
    assert out["big_flat"]["strategy"] == "shuffle"
