"""Unit tests for the privacy/eval/layout wave (qa62–qa66 operators):
k-anonymity, zone-map pruning, seasonality strength, ROC-AUC, seeded
DP-Laplace counts — closed-form edge cases the sf-scale oracles don't
isolate."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.evaluate import roc_auc
from ontology_mapper_spark.operators.layout import zone_map_effectiveness
from ontology_mapper_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_report,
)
from ontology_mapper_spark.operators.temporal import seasonal_strength


def test_k_anonymity_thresholds(spark):
    # classes: (a,x)=3 rows, (a,y)=1 row, (b,x)=5 rows; sensitive s has
    # 1 distinct value in the singleton class.
    rows = (
        [("a", "x", f"s{i}") for i in range(3)]
        + [("a", "y", "s0")]
        + [("b", "x", "s%d" % (i % 2)) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "q1 string, q2 string, s string")
    out = {
        r["k"]: r
        for r in k_anonymity_report(df, ["q1", "q2"], "s", (2, 5)).collect()
    }
    assert out[2]["n_classes"] == 3 and out[2]["n_rows"] == 9
    assert out[2]["classes_below"] == 1 and out[2]["rows_below"] == 1
    assert out[2]["risk_micro"] == round(1_000_000 / 9)
    assert out[5]["classes_below"] == 2 and out[5]["rows_below"] == 4
    assert out[5]["min_class_size"] == 1
    assert out[5]["min_l_diversity"] == 1  # the singleton class


def test_zone_map_sorted_vs_shuffled(spark):
    # 100 rows, value 0..99; sorted layout in 10 files prunes a
    # 10-wide range to exactly one file.
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "id bigint, v bigint"
    )
    out = zone_map_effectiveness(
        df, F.col("v"), F.col("id"), F.col("v"), 10, [(20, 29), (0, 99)],
        "sorted",
    ).collect()
    by_pred = {r["pred_id"]: r for r in out}
    assert by_pred[0]["files_scanned"] == 1
    assert by_pred[0]["rows_scanned"] == 10
    assert by_pred[0]["pruned_micro"] == 900_000
    assert by_pred[1]["files_scanned"] == 10  # full-range predicate
    # interleaved layout (v % 2, v): every file spans low+high values
    out2 = zone_map_effectiveness(
        df, F.col("v") % 7, F.col("id"), F.col("v"), 10, [(20, 29)],
        "shuffled",
    ).collect()
    assert out2[0]["files_scanned"] > 5  # no pruning when unclustered


def test_seasonal_strength_pure_weekly(spark):
    # 4 weeks; Sundays get 10 events, other days 2 → dow explains all
    # variance (R² = 1).  2024-01-07 is a Sunday.
    from datetime import timedelta

    rows = []
    for off in range(28):
        d = datetime(2024, 1, 7) + timedelta(days=off)
        n = 10 if d.weekday() == 6 else 2  # python weekday 6 = Sunday
        rows += [("t", d)] * n
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = seasonal_strength(df, "event_type").collect()[0]
    assert out["n_days"] == 28
    assert out["r2_dow_micro"] == 1_000_000
    assert out["peak_dow"] == 0  # Sunday
    assert out["peak_mean_micro"] == 10_000_000


def test_seasonal_strength_constant_is_null(spark):
    rows = [("t", datetime(2024, 1, d)) for d in range(1, 15)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = seasonal_strength(df, "event_type").collect()[0]
    assert out["r2_dow_micro"] is None  # zero variance → undefined


def test_roc_auc_perfect_ties_and_degenerate(spark):
    rows = (
        # g1: perfect separation (pos scores 10,11 > neg 1,2)
        [("g1", 10, True), ("g1", 11, True), ("g1", 1, False), ("g1", 2, False)]
        # g2: all identical scores → AUC exactly 0.5 via midranks
        + [("g2", 5, True), ("g2", 5, False), ("g2", 5, True), ("g2", 5, False)]
        # g3: single class → NULLs
        + [("g3", 1, True), ("g3", 2, True)]
    )
    df = spark.createDataFrame(rows, "g string, v bigint, y boolean")
    out = {r["g"]: r for r in roc_auc(df, "g", "v", "y").collect()}
    assert out["g1"]["auc_micro"] == 1_000_000
    assert out["g1"]["gini_micro"] == 1_000_000
    assert out["g2"]["auc_micro"] == 500_000
    assert out["g2"]["gini_micro"] == 0
    assert out["g3"]["auc_micro"] is None and out["g3"]["u2"] is None


def test_dp_counts_deterministic_and_centered(spark):
    df = spark.createDataFrame(
        [(f"g{i % 50}",) for i in range(500)], "g string"
    )
    a = {r["g"]: r for r in dp_noisy_counts(df, "g", 500_000, "s1").collect()}
    b = {r["g"]: r for r in dp_noisy_counts(df, "g", 500_000, "s1").collect()}
    c = {r["g"]: r for r in dp_noisy_counts(df, "g", 500_000, "s2").collect()}
    assert a == b  # seeded → replayable
    assert any(a[g]["noise_micro"] != c[g]["noise_micro"] for g in a)
    signs = [1 if a[g]["noise_micro"] > 0 else -1 for g in a]
    assert abs(sum(signs)) < 40  # roughly symmetric noise
    for g, r in a.items():
        assert r["true_n"] == 10
        assert r["noisy_micro"] == r["true_n"] * 1_000_000 + r["noise_micro"]
        assert r["abs_err_micro"] == abs(r["noise_micro"])
    # Laplace(b=2): median |noise| = b·ln 2 ≈ 1.386e6 micro; sanity-band
    errs = sorted(r["abs_err_micro"] for r in a.values())
    assert 500_000 < errs[len(errs) // 2] < 4_000_000
