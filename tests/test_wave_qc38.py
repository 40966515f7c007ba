"""Wave-54 operators: 1-NN label consistency, Theil decomposition."""

from __future__ import annotations

from ontology_mapper_spark.operators.similarity import knn_label_consistency
from ontology_mapper_spark.operators.stats import theil_decomposition


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<double>, label long",
    )


def test_knn_consistency_separated_clusters(spark):
    # two tight clusters, labels match clusters -> perfect consistency
    rows = [([1, 0], 0), ([0.99, 0.01], 0), ([0.98, 0.02], 0),
            ([0, 1], 1), ([0.01, 0.99], 1), ([0.02, 0.98], 1)]
    df = _emb(spark, rows)
    out = knn_label_consistency(df, probe_mod=1).collect()
    assert out[0]["overall_acc_micro"] == 1_000_000
    assert out[0]["n_probes_total"] == 6


def test_knn_consistency_shuffled_labels_poor(spark):
    # same geometry, labels alternate WITHIN clusters -> 1-NN disagrees
    rows = [([1, 0], 0), ([0.99, 0.01], 1), ([0.98, 0.02], 0),
            ([0, 1], 1), ([0.01, 0.99], 0), ([0.02, 0.98], 1)]
    df = _emb(spark, rows)
    out = knn_label_consistency(df, probe_mod=1).collect()
    assert out[0]["overall_acc_micro"] < 500_000


def test_knn_probe_subset_only(spark):
    rows = [([1, 0], 0)] * 5 + [([0, 1], 1)] * 5
    df = _emb(spark, rows)
    out = knn_label_consistency(df, probe_mod=5).collect()
    # probes: vec_id 0 and 5 only
    assert out[0]["n_probes_total"] == 2


def test_theil_equal_values_zero(spark):
    df = spark.createDataFrame(
        [("a", 10)] * 5 + [("b", 10)] * 5, "g string, x long"
    )
    r = theil_decomposition(df, "g", "x").collect()[0]
    assert r["theil_total_micro"] == 0
    assert r["theil_between_micro"] == 0
    assert r["theil_within_micro"] == 0


def test_theil_pure_between(spark):
    # equal within groups, unequal across: all inequality is between
    df = spark.createDataFrame(
        [("a", 10)] * 5 + [("b", 40)] * 5, "g string, x long"
    )
    r = theil_decomposition(df, "g", "x").collect()[0]
    assert r["theil_total_micro"] > 50_000
    # within == 0 (identity: total == between)
    assert abs(r["theil_within_micro"]) <= 5
    assert r["theil_total_micro"] == (
        r["theil_between_micro"] + r["theil_within_micro"]
    )


def test_theil_pure_within(spark):
    # same group means, spread inside each: between ~ 0
    df = spark.createDataFrame(
        [("a", 1), ("a", 39), ("b", 1), ("b", 39)], "g string, x long"
    )
    r = theil_decomposition(df, "g", "x").collect()[0]
    assert abs(r["theil_between_micro"]) <= 5
    assert r["theil_within_micro"] > 100_000
