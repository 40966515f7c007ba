"""Unit tests for the qb85-qb86 wave: Nelson-Aalen cumulative hazard,
Simpson's-paradox detector — closed-form cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import (
    kaplan_meier,
    nelson_aalen,
    simpsons_check,
)


def test_nelson_aalen_closed_form(spark):
    # 4 subjects, events at t=1 (n=4), t=2 (n=3), censored at t=3,
    # event at t=4 (n=1)
    rows = [(1, True), (2, True), (3, False), (4, True)]
    df = spark.createDataFrame(rows, "t long, e boolean")
    out = {r["duration"]: r for r in nelson_aalen(df, "t", "e").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["n_at_risk"] == 4 and out[1]["hazard_micro"] == 250_000
    assert out[2]["n_at_risk"] == 3 and out[2]["hazard_micro"] == 333_333
    assert out[4]["n_at_risk"] == 1 and out[4]["hazard_micro"] == 1_000_000
    assert out[4]["cum_hazard_micro"] == 250_000 + 333_333 + 1_000_000
    # censored-only time 3 produces no output row but thins the risk set
    assert out[4]["n_censored_here"] == 0


def test_nelson_aalen_tracks_km_for_small_hazard(spark):
    # with many subjects and small per-time hazards, H(t) ~ -ln S(t)
    rows = [(t, True) for t in range(1, 101)]
    df = spark.createDataFrame(rows, "t long, e boolean")
    na = {r["duration"]: r for r in nelson_aalen(df, "t", "e").collect()}
    km = {r["duration"]: r for r in kaplan_meier(df, "t", "e").collect()}
    # early times: risk sets are large, the two should agree closely
    for t in (1, 2, 3, 4, 5):
        h = na[t]["cum_hazard_micro"]
        lns = km[t]["ln_s_micro"]
        assert abs(h - (-lns)) < h * 0.05 + 200


def test_simpsons_paradox_fires_on_textbook_case(spark):
    # classic: arm 1 better in BOTH strata, worse pooled.
    # stratum A: arm0 50/100 (0.5), arm1 60/100  (0.6)  -> arm1 better
    # stratum B: arm0 5/100 (0.05), arm1 100/900 (0.11) -> arm1 better
    # pooled: arm0 55/200 (0.275), arm1 160/1000 (0.16) -> arm1 WORSE
    rows = []
    rows += [("A", 0, 1)] * 50 + [("A", 0, 0)] * 50
    rows += [("A", 1, 1)] * 60 + [("A", 1, 0)] * 40
    rows += [("B", 0, 1)] * 5 + [("B", 0, 0)] * 95
    rows += [("B", 1, 1)] * 100 + [("B", 1, 0)] * 800
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = {
        r["s"]: r
        for r in simpsons_check(df, "arm", F.col("y") == 1, "s").collect()
    }
    assert out["__pooled__"]["diff_sign"] == -1
    assert out["A"]["diff_sign"] == 1 and out["B"]["diff_sign"] == 1
    assert all(r["paradox_flag"] == 1 for r in out.values())
    assert out["A"]["agrees_with_pooled"] == 0


def test_simpsons_no_paradox_when_any_stratum_agrees(spark):
    rows = [("A", 0, 0)] * 5 + [("A", 1, 1)] * 5  # arm1 better
    rows += [("B", 0, 1)] * 5 + [("B", 1, 0)] * 5  # arm0 better
    df = spark.createDataFrame(rows, "s string, arm long, y long")
    out = simpsons_check(df, "arm", F.col("y") == 1, "s").collect()
    assert all(r["paradox_flag"] == 0 for r in out)
