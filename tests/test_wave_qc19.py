"""Wave-47 operators: fixed-effect meta, intra-list diversity, DeLong."""

from __future__ import annotations

from ontology_mapper_spark.operators.evaluate import delong_auc_test
from ontology_mapper_spark.operators.similarity import intra_list_diversity
from ontology_mapper_spark.operators.stats import fixed_effect_meta


def test_meta_homogeneous_strata(spark):
    # two identical strata: pooled = per-stratum d, Q ~ 0, I2 null/0
    rows = []
    for st in ("s1", "s2"):
        rows += [(st, True, True)] * 6 + [(st, True, False)] * 4
        rows += [(st, False, True)] * 2 + [(st, False, False)] * 8
    df = spark.createDataFrame(rows, "st string, arm boolean, y boolean")
    out = fixed_effect_meta(df, "st", "arm", "y").collect()
    r = out[0]
    assert r["k_strata"] == 2
    # d = 0.6 - 0.2 = 0.4 in both strata
    assert r["d_micro"] == 400_000
    assert r["pooled_micro"] == 400_000
    assert r["q_milli"] == 0


def test_meta_degenerate_stratum_dropped(spark):
    rows = [("ok", True, True)] * 5 + [("ok", True, False)] * 5
    rows += [("ok", False, True)] * 3 + [("ok", False, False)] * 7
    # zero-variance stratum: every outcome true in both arms
    rows += [("zv", True, True)] * 4 + [("zv", False, True)] * 4
    # one-armed stratum
    rows += [("oa", True, True)] * 4
    df = spark.createDataFrame(rows, "st string, arm boolean, y boolean")
    out = fixed_effect_meta(df, "st", "arm", "y").collect()
    assert {r["st"] for r in out} == {"ok"}
    assert out[0]["k_strata"] == 1


def test_meta_weights_favor_large_stratum(spark):
    rows = []
    rows += [("big", True, i < 30) for i in range(100)]
    rows += [("big", False, i < 10) for i in range(100)]
    rows += [("small", True, i < 3) for i in range(10)]
    rows += [("small", False, i < 1) for i in range(10)]
    df = spark.createDataFrame(rows, "st string, arm boolean, y boolean")
    by = {r["st"]: r for r in fixed_effect_meta(df, "st", "arm", "y").collect()}
    assert by["big"]["w"] > by["small"]["w"]


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_ild_identical_items_zero(spark):
    corpus = _emb(spark, [[1, 0], [1, 0], [1, 0]])
    topk = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2)], "query_id long, vec_id long"
    )
    r = intra_list_diversity(topk, corpus).collect()[0]
    assert r["n_pairs"] == 3 and r["ild_micro"] == 0
    assert r["mean_ild_micro"] == 0


def test_ild_orthogonal_beats_redundant(spark):
    corpus = _emb(spark, [[1, 0], [0, 1], [1, 0.01], [1, 0]])
    diverse = spark.createDataFrame(
        [(0, 0), (0, 1)], "query_id long, vec_id long"
    )
    redundant = spark.createDataFrame(
        [(1, 2), (1, 3)], "query_id long, vec_id long"
    )
    d = intra_list_diversity(diverse, corpus).collect()[0]["ild_micro"]
    r = intra_list_diversity(redundant, corpus).collect()[0]["ild_micro"]
    assert d == 1_000_000  # orthogonal: distance 1
    assert r < 100  # near-duplicates: ~0
    assert d > r


def test_delong_identical_scores_zero_delta(spark):
    rows = [(i, i, i, i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, a long, b long, y boolean")
    r = delong_auc_test(df, "a", "b", "y", "id").collect()[0]
    assert r["auc_a_micro"] == 1_000_000  # perfect separation
    assert r["delta_micro"] == 0
    # identical scores: variance of the DIFFERENCE is 0 -> z null
    assert r["z_milli"] is None


def test_delong_better_score_wins(spark):
    # a separates perfectly; b is anti-ordered for half the items
    rows = []
    for i in range(20):
        y = i >= 10
        b = i if i % 2 == 0 else (19 - i)
        rows.append((i, i, b, y))
    df = spark.createDataFrame(rows, "id long, a long, b long, y boolean")
    r = delong_auc_test(df, "a", "b", "y", "id").collect()[0]
    assert r["auc_a_micro"] == 1_000_000
    assert r["auc_b_micro"] < 1_000_000
    assert r["delta_micro"] > 0
    assert r["z_milli"] is not None and r["z_milli"] > 0


def test_delong_ties_half_credit(spark):
    # all scores equal: AUC = 0.5 exactly via tie credit
    rows = [(i, 7, 7, i % 2 == 0) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, a long, b long, y boolean")
    r = delong_auc_test(df, "a", "b", "y", "id").collect()[0]
    assert r["auc_a_micro"] == 500_000
    assert r["z_milli"] is None  # zero variance
