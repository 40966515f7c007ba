"""Unit tests for the qb76-qb78 wave: Shapley attribution (efficiency
property), time-decay attribution (conservation + recency ordering),
DAU/WAU/MAU stickiness — closed-form cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.temporal import (
    shapley_attribution,
    shapley_lattice,
    stickiness_daily,
    time_decay_attribution,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _ev(eid, day, h, mi, u, t, v=10.0):
    return (eid, datetime(2024, 1, day, h, mi), u, t, v)


def test_shapley_efficiency_and_symmetry(spark):
    # users: {click}: 2 of 4 convert; {view}: 2 of 4 convert;
    # {click,view}: 4 of 4 convert; none-exposed: 0 of 2.
    rows = []
    eid = 0
    u = 0

    def add_user(types, conv):
        nonlocal eid, u
        u += 1
        for t in types:
            eid += 1
            rows.append(_ev(eid, 1, 1, 0, u, t))
        if conv:
            eid += 1
            rows.append(_ev(eid, 1, 2, 0, u, "purchase"))

    for i in range(4):
        add_user(["click"], i < 2)
    for i in range(4):
        add_user(["view"], i < 2)
    for i in range(4):
        add_user(["click", "view"], True)
    for i in range(2):
        add_user(["error"], False)  # exposure set empty
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r["channel"]: r
        for r in shapley_attribution(
            df, "user_id", "event_type", ("click", "view", "signup"),
            "purchase",
        ).collect()
    }
    # symmetric roles -> equal credit
    assert out["click"]["credit_micro"] == out["view"]["credit_micro"]
    assert out["signup"]["credit_micro"] == 0
    # efficiency: sum of credits = v(full) - v(empty); with the
    # containment definition v(full) = overall rate 8/14, v(empty) =
    # unexposed rate 0/2 = 0
    total = sum(r["credit_micro"] for r in out.values())
    assert abs(total - round(8 / 14 * 1_000_000)) <= 3
    assert out["click"]["n_users_exposed"] == 8


def test_shapley_lattice_weights():
    lat = shapley_lattice(("a", "b", "c"))
    assert len(lat) == 12
    # weights per subset size for n=3: size 0 -> 2, size 1 -> 1,
    # size 2 -> 2; per channel they sum to 3! = 6
    per_channel = {}
    for ch, _bit, s, w in lat:
        per_channel.setdefault(ch, 0)
        per_channel[ch] += w
    assert all(v == 6 for v in per_channel.values())


def test_time_decay_conserves_and_prefers_recent(spark):
    # one user: signup 20h before purchase, click 1h before purchase
    rows = [
        _ev(1, 1, 0, 0, 1, "signup"),
        _ev(2, 1, 19, 0, 1, "click"),
        _ev(3, 1, 20, 0, 1, "purchase", 50.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r["touch_type"]: r
        for r in time_decay_attribution(df).collect()
    }
    # credit conserves to exactly 1e6
    assert sum(r["credit_micro"] for r in out.values()) == 1_000_000
    # click (age 1h, e=0, w=16) beats signup (age 20h, e=3, w=2)
    assert out["click"]["credit_micro"] > out["signup"]["credit_micro"]
    # exact shares: 16/18 and 2/18 with remainder to the LAST touch
    assert out["signup"]["credit_micro"] == (1_000_000 * 2) // 18
    assert (
        out["click"]["credit_micro"]
        == 1_000_000 - (1_000_000 * 2) // 18
    )


def test_time_decay_none_bucket(spark):
    rows = [
        _ev(1, 1, 0, 0, 1, "click"),
        _ev(2, 3, 12, 0, 1, "purchase", 30.0),  # click outside 24h
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["touch_type"]: r for r in time_decay_attribution(df).collect()}
    assert set(out) == {"none"}
    assert out["none"]["credit_micro"] == 1_000_000
    assert out["none"]["value_micro_cents"] == 3000 * 1_000_000


def test_stickiness_rolling_distincts(spark):
    # user 1 active days 1 and 5; user 2 active day 5 only
    rows = [
        _ev(1, 1, 1, 0, 1, "click"),
        _ev(2, 5, 1, 0, 1, "click"),
        _ev(3, 5, 2, 0, 2, "view"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["day"]: r for r in stickiness_daily(df, "ts", "user_id").collect()}
    assert out["2024-01-01"]["dau"] == 1
    assert out["2024-01-05"]["dau"] == 2
    # day 5 WAU: user1 (active day 1 and 5) + user2 = 2
    assert out["2024-01-05"]["wau"] == 2
    # only observed-calendar days appear (clipped at max day)
    assert max(out) == "2024-01-05"
    # day 5: dau == wau == mau = 2 -> stickiness 1
    assert out["2024-01-05"]["dau_wau_micro"] == 1_000_000
    assert out["2024-01-05"]["dau_mau_micro"] == 1_000_000
    # days 2..4 have no activity -> no DAU row (observed spine only)
    assert "2024-01-03" not in out
