"""Waves 72-80 operators: NB fit, QQ regression, Woolf, Gopher,
isotonic, GPD, LSH grid, RBP, pass@k, Erlang-B, Bland-Altman,
isotropy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.dedup import lsh_collision_grid
from ontology_mapper_spark.operators.evaluate import (
    isotonic_calibration,
    pass_at_k,
    rbp_at_k,
    rbp_weights,
)
from ontology_mapper_spark.operators.similarity import isotropy_audit
from ontology_mapper_spark.operators.stats import (
    bland_altman,
    gpd_mean_excess,
    negbin_fit,
    qq_decile_regression,
    woolf_homogeneity,
)
from ontology_mapper_spark.operators.temporal import erlang_blocking


def test_negbin_poisson_like_not_overdispersed(spark):
    # constant counts: variance 0 < mean -> Poisson adequate
    df = spark.createDataFrame([("g", i, 5) for i in range(50)],
                               "g string, u long, x long")
    r = negbin_fit(df, "g", "x").collect()[0]
    assert not bool(r["overdispersed"])
    assert r["r_milli"] is None
    assert r["mean_milli"] == 5000


def test_negbin_overdispersed_moments(spark):
    # half 0, half 10: m=5, pop var=25 > m -> r = 25/(25-5)... from
    # integer identity r = S^2/(nQ - S^2 - nS)
    rows = [("g", i, 0) for i in range(25)] + [
        ("g", 25 + i, 10) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "g string, u long, x long")
    r = negbin_fit(df, "g", "x").collect()[0]
    assert bool(r["overdispersed"])
    assert r["var_milli"] == 25_000
    # r = m^2/(v-m) = 25/20 = 1.25
    assert r["r_milli"] == 1250
    # p = m/v = 0.2
    assert r["p_milli"] == 200


def test_qq_same_distribution_identity_line(spark):
    rows = [(False, v % 100) for v in range(1000)] + [
        (True, v % 100) for v in range(1000)
    ]
    df = spark.createDataFrame(rows, "b boolean, v long")
    out = qq_decile_regression(df, "b", "v").collect()
    assert all(r["q_a"] == r["q_b"] for r in out)
    assert out[0]["slope_milli"] == 1000
    assert out[0]["intercept_milli"] == 0


def test_woolf_df_and_pooled_sign(spark):
    # two strata, both with positive association
    rows = []
    for s in ("a", "b"):
        rows += [(s, True, True)] * 30 + [(s, True, False)] * 10
        rows += [(s, False, True)] * 10 + [(s, False, False)] * 30
    df = spark.createDataFrame(rows, "s string, e boolean, y boolean")
    r = woolf_homogeneity(df, "s", "e", "y").collect()[0]
    assert r["df"] == 1
    assert r["lnor_pooled_micro"] > 0
    # identical strata -> Q ~ 0
    assert abs(r["q_milli"]) <= 1


def test_isotonic_pools_violator(spark):
    # scores 0..39 in 4 natural bins of 10; rates .2, .6, .4, .8 ->
    # bins 2,3 pool to .5
    rows = []
    for b, rate in enumerate([2, 6, 4, 8]):
        for i in range(10):
            rows.append((b * 10 + i, i < rate))
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = {r["r"]: r for r in isotonic_calibration(df, "s", "y", 4).collect()}
    assert out[1]["iso_micro"] == 200_000
    assert out[2]["iso_micro"] == 500_000
    assert out[3]["iso_micro"] == 500_000
    assert out[4]["iso_micro"] == 800_000
    # monotone
    vals = [out[r]["iso_micro"] for r in sorted(out)]
    assert vals == sorted(vals)


def test_gpd_uniform_tail_xi_minus_one(spark):
    # uniform integers: excesses above any threshold are uniform ->
    # m^2/s^2 -> 3, xi -> -1 (in the n->inf population limit)
    df = spark.createDataFrame([(v,) for v in range(10_000)], "v long")
    out = {r["pct"]: r for r in gpd_mean_excess(df, "v", (50, 90)).collect()}
    for p in (50, 90):
        assert abs(out[p]["xi_milli"] + 1000) <= 5


def test_lsh_grid_monotone_in_s(spark):
    out = lsh_collision_grid(spark).collect()
    by_cfg = {}
    for r in out:
        by_cfg.setdefault((r["b"], r["r"]), {})[r["s_decile"]] = r["p_micro"]
    for cfg, curve in by_cfg.items():
        vals = [curve[s] for s in range(1, 10)]
        assert vals == sorted(vals), cfg
    # b=32,r=4 is the most permissive config at low similarity
    assert by_cfg[(32, 4)][3] > by_cfg[(8, 16)][3]


def test_lsh_collision_grid_rejects_unsupported_config(spark):
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        lsh_collision_grid(spark, configs=((64, 2),))


def test_rbp_all_relevant_complements_residual(spark):
    rows = [(1, k, 1) for k in range(1, 11)]
    df = spark.createDataFrame(rows, "q long, rank long, rel long")
    r = rbp_at_k(df, "q", "rank", "rel", 10).collect()[0]
    w = rbp_weights(10)
    assert r["hits_w"] == sum(w)
    assert r["rbp_micro"] + r["residual_micro"] in (999_999, 1_000_000, 1_000_001)


def test_pass_at_1_equals_c_over_n(spark):
    # unbiased property: pass@1 = c/n exactly
    rows = []
    for t in range(4):
        for i in range(10):
            rows.append((t, i, i < (t * 3)))  # c = 0, 3, 6, 9
    df = spark.createDataFrame(rows, "t long, o long, ok boolean")
    out = pass_at_k(df, "t", "ok", ["o"], 10, (1, 10))
    k1 = {r["c"]: r for r in out.collect() if r["k"] == 1}
    for c in (0, 3, 6, 9):
        assert k1[c]["pass_micro"] == c * 100_000
    k10 = {r["c"]: r for r in out.collect() if r["k"] == 10}
    assert k10[0]["pass_micro"] == 0
    assert k10[3]["pass_micro"] == 1_000_000


def test_erlang_b_decreasing_and_first_server(spark):
    # two users, long overlapping sessions -> some offered load a
    rows = []
    for u in range(3):
        rows += [(u, 1_000_000 + k * 60_000_000) for k in range(30)]
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    out = sorted(
        erlang_blocking(df).collect(), key=lambda r: r["c"]
    )
    vals = [r["erlang_b_micro"] for r in out]
    assert vals == sorted(vals, reverse=True)
    # B(1) = a/(1+a) with a = dur/span
    a = out[0]["a_milli"] / 1000
    assert abs(vals[0] - round(a / (1 + a) * 1e6)) <= 2000


def test_bland_altman_symmetric_bias_zero(spark):
    rows = []
    for u in range(20):
        rows += [(u, False, 100 + u), (u, True, 100 + u)]
    df = spark.createDataFrame(rows, "u long, b boolean, v long")
    r = bland_altman(df, "u", "b", "v").collect()[0]
    assert r["n_pairs"] == 20
    assert r["bias_milli"] == 0
    assert r["sd_milli"] == 0
    assert r["n_outside"] == 0


def test_isotropy_identical_vectors_fully_anisotropic(spark):
    df = spark.createDataFrame(
        [(i, [0.6, 0.8, 0.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    r = isotropy_audit(df).collect()[0]
    assert abs(r["anisotropy_micro"] - 1_000_000) <= 5
    assert abs(r["mean_norm2_micro"] - 1_000_000) <= 5
