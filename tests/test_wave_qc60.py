"""Waves 65-71 operators: Little's law, Fisher median test, KN LM,
WoE/IV, RDD, periodogram, PCA power iteration, FD audit, soundex,
Aalen-Johansen."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.dq import fd_audit
from ontology_mapper_spark.operators.linkage import (
    phonetic_blocking_pairs,
    soundex_col,
)
from ontology_mapper_spark.operators.similarity import pca_power_iteration
from ontology_mapper_spark.operators.stats import (
    aalen_johansen,
    fisher_median_test,
    fisher_weights,
    regression_discontinuity,
)
from ontology_mapper_spark.operators.temporal import (
    littles_law_audit,
    periodogram,
)


def test_littles_law_identity_holds(spark):
    # overlapping + midnight-spanning sessions: the sweep integral must
    # equal summed durations EXACTLY, whatever the overlap structure
    rows = []
    base = 86_400_000_000 * 3 - 3_600_000_000  # 1h before midnight
    for u in range(7):
        for k in range(4):
            t0 = base + u * 900_000_000 + k * 7_200_000_000
            rows += [(u, t0), (u, t0 + 600_000_000)]
    df = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    r = littles_law_audit(df).collect()[0]
    assert r["identity_diff"] == 0
    assert r["sum_dur_us"] == r["sweep_integral_us"]
    assert r["n_sessions"] == 28
    # w_mean_us is the rounded mean duration
    assert r["w_mean_us"] == round(r["sum_dur_us"] / r["n_sessions"])


def test_fisher_weights_symmetric_and_p_bounds(spark):
    w = fisher_weights(10)
    assert w == w[::-1]
    assert sum(w) == math.comb(20, 10)
    # most extreme table (a=0) has the smallest two-sided p; a=5 gives 1
    rows = []
    # group "g": first half all high (a=0 overlap of first-half & top10
    # means... construct: first 10 arrivals have LOW values)
    for i in range(20):
        rows.append(("g", i, 100 + i))  # values increase with arrival
    df = spark.createDataFrame(rows, "g string, o long, v long")
    r = fisher_median_test(df, "g", "v", ["o"], m=10).collect()[0]
    # first half holds ranks 11..20 by value desc -> a = 0, extreme
    assert r["a_high_first"] == 0
    assert r["w_obs"] == 1
    assert r["p_num"] == 2  # both tails' extreme tables
    assert r["p_micro"] == round(2 * 1e6 / math.comb(20, 10))
    assert bool(r["significant"])


def test_fisher_median_test_balanced_not_significant(spark):
    # alternate high/low arrivals -> a = 5, pmf is maximal, p = 1
    rows = [("g", i, 1000 + (i % 2) * 100) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    r = fisher_median_test(df, "g", "v", ["o"], m=10).collect()[0]
    assert r["a_high_first"] == 5
    assert r["p_micro"] == 1_000_000
    assert not bool(r["significant"])


def test_rdd_detects_injected_jump(spark):
    # y = 10*x below cutoff 50, 10*x + 5000 at/above: jump ~ 5000 micro-
    # exactly (perfect linear fit both sides)
    rows = [(i, i, 10 * i + (5000 if i >= 50 else 0)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long").withColumn(
        "_cut", F.lit(50).cast("long")
    )
    r = regression_discontinuity(df, "x", "y", "_cut", bandwidth=10).collect()[
        0
    ]
    assert r["rdd_jump_micro"] == 5000 * 1_000_000
    assert r["slope_left_micro"] == 10 * 1_000_000
    assert r["slope_right_micro"] == 10 * 1_000_000


def test_periodogram_finds_weekly_cycle(spark):
    # 10 weeks of daily counts with a strong period-7 pattern
    rows = [(t, 100 + (50 if t % 7 == 0 else 0)) for t in range(70)]
    df = spark.createDataFrame(rows, "t long, x long")
    out = {r["p"]: r for r in periodogram(df, "t", "x").collect()}
    assert bool(out[7]["is_peak"])
    assert out[7]["amp_milli"] > out[5]["amp_milli"]
    assert out[7]["amp_milli"] > out[3]["amp_milli"]


def test_pca_power_iteration_finds_dominant_axis(spark):
    # points along the (1, 1)/sqrt(2) axis in 4d with small noise on dim 3
    rows = []
    for i in range(-20, 21):
        rows.append((i + 21, [float(i), float(i), float(i % 3) * 0.1, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pca_power_iteration(df, "embedding", "vec_id", rounds=6)
    vs = {r["j"]: r for r in out.collect()}
    # unit vector in micro units
    nrm = math.sqrt(sum(r["v_micro"] ** 2 for r in vs.values())) / 1e6
    assert abs(nrm - 1.0) < 1e-3
    # dominant direction ~ (.707, .707, ~0, 0)
    assert abs(abs(vs[1]["v_micro"]) - 707_107) < 2_000
    assert abs(abs(vs[2]["v_micro"]) - 707_107) < 2_000
    assert abs(vs[4]["v_micro"]) < 1_000
    # PC1 explains nearly everything
    assert vs[1]["evr_micro"] > 990_000
    assert vs[1]["lambda_nano"] <= vs[1]["trace_nano"]


def test_fd_audit_key_vs_violated(spark):
    rows = [(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "x")]
    df = spark.createDataFrame(rows, "id long, g string, v string")
    out = {
        (r["lhs"], r["rhs"]): r
        for r in fd_audit(df, [("id", "v"), ("g", "v")]).collect()
    }
    assert bool(out[("id", "v")]["fd_holds"])
    assert out[("id", "v")]["g3_violations"] == 0
    assert not bool(out[("g", "v")]["fd_holds"])
    # g 'a' splits 1/1 -> delete 1 row; g 'b' is clean
    assert out[("g", "v")]["g3_violations"] == 1
    assert out[("g", "v")]["g3_micro"] == 250_000


def test_soundex_blocking_catches_spelling_variants(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Smith",), ("Smyth",), ("Jones",)],
        "p_name string",
    )
    codes = dict(
        df.select("p_name", soundex_col("p_name").alias("c")).collect()
    )
    assert codes["Robert"] == codes["Rupert"] == "R163"
    assert codes["Smith"] == codes["Smyth"]
    pairs = phonetic_blocking_pairs(df, "p_name", 3).collect()
    got = {(r["name_a"], r["name_b"]) for r in pairs}
    assert ("Smith", "Smyth") in got
    # Robert/Rupert differ by lev 3 -> kept; Jones pairs with nothing
    assert ("Robert", "Rupert") in got
    assert all("Jones" not in p for p in got)


def test_aalen_johansen_monotone_and_bounded(spark):
    # 6 subjects: cause1 at t=1,2; cause2 at t=2; censored at 3; cause1
    # at 4; censored at 5
    rows = [(1, 1), (2, 1), (2, 2), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, "t long, k int")
    out = aalen_johansen(df, "t", "k").orderBy("duration").collect()
    prev1 = prev2 = 0
    for r in out:
        assert r["cif1_nano"] >= prev1
        assert r["cif2_nano"] >= prev2
        prev1, prev2 = r["cif1_nano"], r["cif2_nano"]
        assert r["cif1_nano"] + r["cif2_nano"] <= 1_000_000_000 + 1000
    # hand check first step: n=6, d1=1 -> CIF1(1) = 1/6
    first = out[0]
    assert first["n_at_risk"] == 6
    assert abs(first["cif1_nano"] - round(1e9 / 6)) <= 2
