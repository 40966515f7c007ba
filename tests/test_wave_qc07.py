"""Wave-43 operators: Markov removal attribution, Qini, U-shaped."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.evaluate import qini_curve
from ontology_mapper_spark.operators.temporal import (
    markov_removal_attribution,
    position_based_attribution,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, i), u, t, v)
            for i, (u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_markov_removal_single_channel_chain(spark):
    # u1: click -> purchase; u2: click -> (no conv); u3: view -> purchase
    rows = [
        (1, "click", 0.0), (1, "purchase", 10.0),
        (2, "click", 0.0),
        (3, "view", 0.0), (3, "purchase", 5.0),
    ]
    out = {
        r["channel"]: r
        for r in markov_removal_attribution(_ev(spark, rows)).collect()
    }
    # base: start->click 2/3, start->view 1/3; click->conv 1/2,
    # click->drop 1/2; view->conv 1
    # P(conv) = 2/3*1/2 + 1/3*1 = 2/3 -> 666667 micro (rounded cells:
    # 666667*500000//1e6 = 333333; 333333*1000000//1e6 + ... compute below
    base = out["click"]["p_base_micro"]
    assert base == 666666  # 333333 (click path) + 333333 (view path)
    # removing view: only click path remains
    assert out["view"]["p_removed_micro"] == 333333
    # removing click: only view path remains
    assert out["click"]["p_removed_micro"] == 333333
    # signup never appears: removal changes nothing
    assert out["signup"]["p_removed_micro"] == base
    assert out["signup"]["removal_effect_micro"] == 0
    assert out["click"]["removal_effect_micro"] == out["view"][
        "removal_effect_micro"
    ]
    # credits split 50/50 between click and view
    assert out["click"]["credit_micro"] == 500_000


def test_markov_removal_zero_touch_users_count(spark):
    # u1 purchases with no touches; u2 has touch, no purchase
    rows = [(1, "purchase", 1.0), (2, "click", 0.0)]
    out = markov_removal_attribution(_ev(spark, rows)).collect()
    # start->conv 1/2, start->click 1/2, click->drop 1
    for r in out:
        assert r["p_base_micro"] == 500_000
        # organic conversions survive all removals
        assert r["p_removed_micro"] == 500_000
        assert r["removal_effect_micro"] == 0


def test_position_attribution_u_shape(spark):
    # one journey with 4 touches then purchase: credits 400k/100k/100k/400k
    rows = [
        (1, "click", 0.0), (1, "view", 0.0), (1, "view", 0.0),
        (1, "signup", 0.0), (1, "purchase", 20.0),
    ]
    out = {
        r["touch_type"]: r
        for r in position_based_attribution(_ev(spark, rows)).collect()
    }
    assert out["click"]["credit_micro"] == 400_000       # first
    assert out["signup"]["credit_micro"] == 400_000      # last
    assert out["view"]["credit_micro"] == 200_000        # 2 middles
    total = sum(r["credit_micro"] for r in out.values())
    assert total == 1_000_000


def test_position_attribution_conservation_and_n2(spark):
    rows = [
        (1, "click", 0.0), (1, "view", 0.0), (1, "purchase", 10.0),
        (2, "view", 0.0), (2, "purchase", 4.0),
        (3, "purchase", 2.0),  # no-touch -> 'none'
    ]
    out = {
        r["touch_type"]: r
        for r in position_based_attribution(_ev(spark, rows)).collect()
    }
    # n=2: 400k first + 600k last; n=1: 1e6; none: 1e6
    assert out["click"]["credit_micro"] == 400_000
    assert out["view"]["credit_micro"] == 600_000 + 1_000_000
    assert out["none"]["credit_micro"] == 1_000_000
    total = sum(r["credit_micro"] for r in out.values())
    assert total == 3_000_000


def test_qini_perfect_targeting(spark):
    # high score = treated converters; control never converts
    rows = (
        [(2, True, True)] * 4       # top score, treated, converted
        + [(2, False, False)] * 4
        + [(1, True, False)] * 4
        + [(1, False, False)] * 4
    )
    df = spark.createDataFrame(rows, "s long, tr boolean, y boolean")
    out = qini_curve(df, "s", "tr", "y").collect()
    by = {r["s"]: r for r in out}
    # at score 2: cum 4 treated, 4 control, 4 vs 0 conversions
    assert by[2]["uplift_milli"] == 4000
    assert by[2]["cum_n_t"] == 4 and by[2]["cum_y_c"] == 0
    # final point: same uplift (no more conversions below)
    assert by[1]["uplift_milli"] == 4000
    # area: (4-0)*(4000+0) + (8-4)*(4000+4000) = 48000
    assert out[0]["auqc2_milli"] == 48_000
    # random diagonal: 8 * 4000 = 32000; qini > 0
    assert out[0]["rand2_milli"] == 32_000
    assert out[0]["qini2_milli"] == 16_000


def test_qini_null_effect_score(spark):
    # outcome independent of score and treatment: qini ~ 0
    rows = []
    for s in range(4):
        rows += [(s, True, s % 2 == 0), (s, False, s % 2 == 0)]
    df = spark.createDataFrame(rows, "s long, tr boolean, y boolean")
    out = qini_curve(df, "s", "tr", "y").collect()
    assert out[0]["qini2_milli"] == 0
