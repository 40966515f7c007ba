"""Unit tests for the temporal-analytics wave (qa57–qa61 operators):
LOCF gap-fill, ordered funnel, cohort retention, Spearman rho, Fleiss
kappa — closed-form edge cases the sf-scale oracles don't isolate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import fleiss_kappa, spearman_rho
from ontology_mapper_spark.operators.temporal import (
    cohort_retention,
    funnel_stages,
    locf_gapfill,
)


def _ts(day: int, h: int = 0) -> datetime:
    return datetime(2024, 1, day, h)


def test_locf_fills_gaps_and_staleness(spark):
    df = spark.createDataFrame(
        [("a", _ts(1)), ("a", _ts(1, 5)), ("a", _ts(4)), ("b", _ts(2))],
        "k string, ts timestamp",
    )
    rows = {
        (r["k"], r["day"]): r
        for r in locf_gapfill(df, "k").collect()
    }
    # a: spine 01..04, days 02/03 are gaps carrying day-01's count of 2
    assert rows[("a", "2024-01-01")]["n_obs"] == 2
    assert rows[("a", "2024-01-02")]["n_obs"] is None
    assert rows[("a", "2024-01-02")]["filled"] == 2
    assert rows[("a", "2024-01-02")]["staleness_days"] == 1
    assert rows[("a", "2024-01-03")]["staleness_days"] == 2
    assert rows[("a", "2024-01-04")]["n_obs"] == 1
    assert rows[("a", "2024-01-04")]["staleness_days"] == 0
    # b: single-day spine, no gaps
    assert set(k for k in rows if k[0] == "b") == {("b", "2024-01-02")}


def test_funnel_requires_strictly_later_steps(spark):
    # u1 completes view<click<purchase; u2 clicks BEFORE viewing (no
    # stage 2); u3 only views; u4 never enters the funnel.
    df = spark.createDataFrame(
        [
            (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
            (2, "click", _ts(1)), (2, "view", _ts(2)),
            (3, "view", _ts(1)),
            (4, "error", _ts(1)),
        ],
        "u bigint, t string, ts timestamp",
    )
    out = {
        r["stage"]: r
        for r in funnel_stages(df, "u", "t", "ts",
                               ["view", "click", "purchase"]).collect()
    }
    assert out[1]["n_users"] == 3 and out[1]["step_name"] == "view"
    # stage-1 conversion vs all 4 distinct users
    assert out[1]["conv_from_prev_micro"] == 750_000
    assert out[2]["n_users"] == 1
    assert out[2]["conv_from_prev_micro"] == round(1_000_000 / 3)
    assert out[3]["n_users"] == 1
    assert out[3]["conv_from_prev_micro"] == 1_000_000


def test_funnel_unreached_stage_emits_no_row(spark):
    df = spark.createDataFrame(
        [(1, "view", _ts(1))], "u bigint, t string, ts timestamp"
    )
    out = funnel_stages(df, "u", "t", "ts", ["view", "click"]).collect()
    assert [r["stage"] for r in out] == [1]


def test_cohort_retention_triangle(spark):
    # cohort 01: users 1,2 — day-1 offset keeps only user 1
    df = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(1)), (1, _ts(2)), (3, _ts(2))],
        "u bigint, ts timestamp",
    )
    out = {
        (r["cohort_day"], r["offset_days"]): r
        for r in cohort_retention(df, "u").collect()
    }
    r0 = out[("2024-01-01", 0)]
    assert r0["n_active"] == 2 and r0["cohort_n"] == 2
    assert r0["retention_micro"] == 1_000_000
    r1 = out[("2024-01-01", 1)]
    assert r1["n_active"] == 1 and r1["retention_micro"] == 500_000
    assert out[("2024-01-02", 0)]["cohort_n"] == 1


def test_spearman_perfect_and_inverse(spark):
    rows = [("g", i, i * 10, i) for i in range(1, 6)] + [
        ("h", i, 100 - i, i) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint, id bigint")
    out = {r["g"]: r for r in spearman_rho(df, "g", "x", "y", "id").collect()}
    assert out["g"]["sum_d2"] == 0 and out["g"]["rho_micro"] == 1_000_000
    assert out["h"]["rho_micro"] == -1_000_000


def test_fleiss_kappa_perfect_agreement(spark):
    rows = [(i, r, "cat%d" % (i % 3)) for i in range(12) for r in range(4)]
    df = spark.createDataFrame(rows, "i bigint, r int, c string")
    out = fleiss_kappa(df, "i", "c").collect()[0]
    assert out["n_items"] == 12 and out["n_raters"] == 4
    assert out["p_bar_micro"] == 1_000_000
    assert out["kappa_micro"] == 1_000_000


def test_fleiss_kappa_known_value(spark):
    # 2 items, 2 raters: item 0 agrees on A, item 1 splits A/B.
    # S = (4 + 1 + 1) = 6; N·n = 4; P̄ = (6-4)/(2·2·1) = 0.5
    # T_A=3, T_B=1 → P̄e = (9+1)/16 = 0.625 → κ = (0.5-0.625)/0.375
    df = spark.createDataFrame(
        [(0, 1, "A"), (0, 2, "A"), (1, 1, "A"), (1, 2, "B")],
        "i bigint, r int, c string",
    )
    out = fleiss_kappa(df, "i", "c").collect()[0]
    assert out["p_bar_micro"] == 500_000
    assert out["p_e_micro"] == 625_000
    assert out["kappa_micro"] == round((0.5 - 0.625) * 1e6 / 0.375)
