"""Wave-50 operators: robust means, activity streaks, max drawdown."""

from __future__ import annotations

import datetime as dt

from ontology_mapper_spark.operators.stats import robust_means
from ontology_mapper_spark.operators.temporal import (
    activity_streaks,
    max_drawdown_daily,
)


def test_robust_means_whale_resistance(spark):
    # 99 values of 10 + one whale of 100000
    rows = [("a", 10)] * 99 + [("a", 100000)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = robust_means(df, "g", "v", 10, 90).collect()[0]
    assert r["mean_milli"] == 1_009_900  # dragged by the whale
    assert r["q_lo"] == 10 and r["q_hi"] == 10
    assert r["winsor_mean_milli"] == 10_000
    assert r["trimmed_mean_milli"] == 10_000
    assert r["n_kept"] == 99


def test_robust_means_uniform_hand(spark):
    # values 1..10, one each: q_lo=1 (cum 1 >= 1), q_hi=9
    rows = [("g", v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = robust_means(df, "g", "v", 10, 90).collect()[0]
    assert (r["q_lo"], r["q_hi"]) == (1, 9)
    assert r["mean_milli"] == 5500
    # winsor: 10 clamps to 9 -> sum 54 -> 5.4
    assert r["winsor_mean_milli"] == 5400
    # trimmed keeps 1..9 -> mean 5
    assert r["trimmed_mean_milli"] == 5000 and r["n_kept"] == 9


def _ev_days(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, "click", float(v))
            for i, (u, d, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_activity_streaks_hand(spark):
    # u1 active days 1,2,3,7,8 -> streaks [3,2]; u2 day 5 only
    rows = [(1, 1, 5, 0), (1, 2, 6, 0), (1, 2, 9, 0), (1, 3, 1, 0),
            (1, 7, 2, 0), (1, 8, 3, 0), (2, 5, 4, 0)]
    df = _ev_days(spark, rows)
    by = {r["user_id"]: r for r in activity_streaks(df).collect()}
    assert by[1]["n_active_days"] == 5
    assert by[1]["n_streaks"] == 2
    assert by[1]["longest_streak"] == 3
    assert by[2]["longest_streak"] == 1 and by[2]["n_streaks"] == 1


def test_max_drawdown_hand(spark):
    # daily sums: +10, +5, -12, +1, -2 -> cum 10,15,3,4,2
    # peak 10,15,15,15,15; dd 0,0,12,11,13 -> max 13 on day 5
    rows = [
        (1, 1, 1, 10.0), (1, 2, 1, 5.0), (1, 3, 1, -12.0),
        (1, 4, 1, 1.0), (1, 5, 1, -2.0),
    ]
    df = _ev_days(spark, rows)
    r = max_drawdown_daily(df).collect()[0]
    assert r["n_days"] == 5
    assert r["final_cents"] == 200
    assert r["peak_cents"] == 1500
    assert r["max_drawdown_cents"] == 1300
    # worst day = day 5
    assert r["worst_day_epoch"] == (dt.date(2024, 1, 5) - dt.date(1970, 1, 1)).days


def test_max_drawdown_monotone_rise_is_zero(spark):
    rows = [(1, d, 1, 5.0) for d in range(1, 6)]
    df = _ev_days(spark, rows)
    r = max_drawdown_daily(df).collect()[0]
    assert r["max_drawdown_cents"] == 0
    # tie on dd=0 every day: worst day = EARLIEST
    assert r["worst_day_epoch"] == (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
