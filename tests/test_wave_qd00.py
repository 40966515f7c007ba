"""Waves 84-92 operators: MMD, energy distance, GK lambda, bloom
planner, conformal curve, markup density, nested quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.dq import gk_lambda
from ontology_mapper_spark.operators.evaluate import conformal_alpha_curve
from ontology_mapper_spark.operators.sketch import (
    bloom_planner,
    bloom_planner_rows,
)
from ontology_mapper_spark.operators.stats import (
    energy_distance,
    mmd_quadratic,
)
from ontology_mapper_spark.operators.temporal import daily_p95_weekly_median
from ontology_mapper_spark.operators.textstats import markup_density


def test_mmd_identical_slices_zero(spark):
    rows = [(b, v) for b in (False, True) for v in range(100)]
    df = spark.createDataFrame(rows, "b boolean, v long")
    r = mmd_quadratic(df, "b", "v", 10_000).collect()[0]
    assert r["mmd2_micro"] == 0
    assert r["kaa_micro"] == r["kbb_micro"] == r["kab_micro"]


def test_energy_distance_identical_zero_and_shift_positive(spark):
    same = [(b, v) for b in (False, True) for v in range(200)]
    df = spark.createDataFrame(same, "b boolean, v long")
    r = energy_distance(df, "b", "v").collect()[0]
    assert r["energy_milli"] == 0
    shifted = [(False, v) for v in range(200)] + [
        (True, v + 50) for v in range(200)
    ]
    df2 = spark.createDataFrame(shifted, "b boolean, v long")
    r2 = energy_distance(df2, "b", "v").collect()[0]
    # pure location shift of 50: E|X-Y| grows, within-terms unchanged
    assert r2["energy_milli"] > 0
    assert r2["exx_milli"] == r2["eyy_milli"]


def test_gk_lambda_perfect_and_independent(spark):
    # id -> v is a perfect predictor; g -> v is useless (modal B
    # prediction never improves)
    rows = [(i, "g", f"v{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    out = {
        (r["lhs"], r["rhs"]): r
        for r in gk_lambda(df, [("id", "v"), ("g", "v")]).collect()
    }
    assert out[("id", "v")]["lambda_micro"] == 1_000_000
    assert out[("g", "v")]["lambda_micro"] == 0


def test_bloom_planner_rows_and_memory(spark):
    rows = dict(
        ((b, k), (f, o)) for b, k, f, o in bloom_planner_rows()
    )
    # analytic optimum k = round(b ln2)
    assert rows[(8, 6)][1] and rows[(12, 8)][1] and rows[(16, 11)][1]
    assert not rows[(8, 4)][1] and not rows[(16, 8)][1]
    # more bits at optimal k -> lower FPR
    assert rows[(16, 11)][0] < rows[(8, 6)][0]
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = {r["bits_per_key"]: r for r in bloom_planner(df, "doc_id").collect()}
    assert out[8]["bits_total"] == 8000
    assert out[8]["n_keys"] == 1000


def test_conformal_curve_monotone(spark):
    rows = [(i, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, s long")
    out = {
        r["alpha_bp"]: r
        for r in conformal_alpha_curve(df, "s", "doc_id").collect()
    }
    # larger alpha -> smaller rank -> q_hat nonincreasing as alpha grows
    qs = [out[a]["q_hat"] for a in (200, 500, 1000, 2000)]
    assert qs == sorted(qs, reverse=True)
    # coverage roughly tracks target (uniform scores, big n)
    for a in (200, 500, 1000, 2000):
        assert abs(out[a]["coverage_micro"] - out[a]["target_micro"]) < 60_000


def test_markup_density_flags_tables(spark):
    rows = [("t", "a|b|c|d|e", 1)] * 5 + [("p", "plain prose here", 2)] * 5
    df = spark.createDataFrame(rows, "source string, text string, x long")
    out = {r["source"]: r for r in markup_density(df).collect()}
    assert out["t"]["pipes_per_doc_milli"] == 4000
    assert bool(out["t"]["tabular_suspect"])
    assert out["p"]["pipes"] == 0
    assert not bool(out["p"]["tabular_suspect"])


def test_nested_quantiles_exact(spark):
    # 3 days, each 0..99 at one-second spacing: daily p95 = 94 (rank
    # ceil(.95*100)=95 -> value 94); median of identical p95s = 94
    rows = []
    for d in range(3):
        for i in range(100):
            rows.append((d * 86_400_000_000 + i * 1_000_000, i))
    df = spark.createDataFrame(rows, "us long, v long").select(
        F.timestamp_micros(F.col("us")).alias("ts"), "v"
    )
    out = daily_p95_weekly_median(df, "ts", "v").collect()
    assert len(out) == 3
    for r in out:
        assert r["p95_value"] == 94
        assert r["median_daily_p95"] == 94
        assert r["p95_min"] == 94 and r["p95_max"] == 94
