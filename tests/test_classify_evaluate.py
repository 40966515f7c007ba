"""Semantic tests for classify/evaluate/linkage/stats additions (qa25-qa32).

The DuckDB oracle gate (tools/check_correctness.py) pins bit-exactness;
these tests pin the SEMANTICS the oracles can't see: separable corpora
classify correctly, recall is 1 against itself, drift of a uniform corpus
is perfect alignment, fuzzy pairs respect the block and the distance
bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_nb_recovers_separable_sources(spark):
    from ontology_mapper_spark.operators.classify import nb_label_scores

    rows = []
    for i in range(8):
        rows.append((i, "fruit", "apple banana cherry apple banana"))
        rows.append((100 + i, "metal", "iron copper zinc iron copper"))
    out = nb_label_scores(_docs(spark, rows)).collect()
    assert len(out) == 16
    assert all(r["correct"] == 1 for r in out)
    assert all(r["pred_source"] == r["source"] for r in out)


def test_nb_unseen_word_smoothing(spark):
    from ontology_mapper_spark.operators.classify import nb_label_scores

    # one doc mixes in a word only the other class saw — smoothing must
    # keep every (word, class) defined and still classify by the majority
    rows = [
        (1, "a", "x x x x y"),
        (2, "a", "x x x"),
        (3, "b", "y y y y"),
        (4, "b", "y y x"),
    ]
    out = {r["doc_id"]: r for r in nb_label_scores(_docs(spark, rows)).collect()}
    assert out[1]["pred_source"] == "a"
    assert out[3]["pred_source"] == "b"


def test_dsir_selects_target_like_docs(spark):
    from ontology_mapper_spark.operators.classify import dsir_weights

    rows = [(i, "tgt", "alpha beta alpha beta alpha") for i in range(5)]
    rows += [(10 + i, "raw", "gamma delta gamma delta gamma") for i in range(20)]
    rows += [(50, "raw", "alpha beta alpha beta")]  # target-like raw doc
    out = dsir_weights(
        _docs(spark, rows), target_label="tgt", select_k=6
    ).collect()
    sel = {r["doc_id"] for r in out if r["selected"] == 1}
    assert len(sel) == 6
    assert sel == {0, 1, 2, 3, 4, 50}
    w = {r["doc_id"]: r["weight_micro"] for r in out}
    assert w[50] > w[10]  # target-like raw doc outranks off-target docs


def test_edit_distance_pairs_block_and_bound(spark):
    from ontology_mapper_spark.operators.linkage import edit_distance_pairs

    df = spark.createDataFrame(
        [("red widget",), ("hot widget",), ("red widget",), ("red gadget",),
         ("blue bolt",), ("blue jolt",)],
        ["p_name"],
    )
    out = edit_distance_pairs(df, "p_name", max_dist=3).collect()
    pairs = {(r["name_a"], r["name_b"]): r["dist"] for r in out}
    # same block (widget): red vs hot = 3; gadget is a different block
    assert pairs[("hot widget", "red widget")] == 3
    assert ("red gadget", "red widget") not in pairs
    # bolt vs jolt: different blocks -> excluded even though dist 1
    assert ("blue bolt", "blue jolt") not in pairs
    # no self-pairs from the duplicated name (distinct-first, dist>=1)
    assert all(a < b for (a, b) in pairs)
    assert all(1 <= d <= 3 for d in pairs.values())


def test_topk_recall_bounds(spark):
    from ontology_mapper_spark.operators.evaluate import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "vec_id"]
    )
    # approx misses one of query 2's hits
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)], ["query_id", "vec_id"]
    )
    out = {r["query_id"]: r for r in topk_recall(approx, exact).collect()}
    assert out[1]["recall_micro"] == 1_000_000
    assert out[2]["recall_micro"] == 500_000
    # self-recall is always exactly 1
    self_out = topk_recall(exact, exact).collect()
    assert all(r["recall_micro"] == 1_000_000 for r in self_out)


def test_centroid_drift_uniform_corpus_aligns(spark):
    from ontology_mapper_spark.operators.similarity import centroid_drift

    rows = [(i, [1.0, 2.0, 3.0], i % 2) for i in range(6)]
    out = centroid_drift(
        spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    ).collect()
    # every label's centroid equals the global centroid -> cosine exactly 1
    assert {r["cos_micro"] for r in out} == {1_000_000}
    assert {r["n_vecs"] for r in out} == {3}


def test_kl_divergence_zero_for_identical_groups(spark):
    from ontology_mapper_spark.operators.stats import kl_divergence

    rows = [("a", w) for w in "x x y z".split()] + [
        ("b", w) for w in "x x y z".split()
    ]
    df = spark.createDataFrame(rows, ["g", "w"])
    out = kl_divergence(df, "g", "w").collect()
    # both groups match the corpus distribution exactly -> KL == 0
    assert all(r["kl_micro"] == 0 for r in out)
    skew = spark.createDataFrame(
        [("a", "x")] * 9 + [("a", "y")] + [("b", "y")] * 9 + [("b", "x")],
        ["g", "w"],
    )
    out2 = {r["g"]: r["kl_micro"] for r in kl_divergence(skew, "g", "w").collect()}
    assert out2["a"] > 0 and out2["b"] > 0


def test_zipf_slope_sign(spark):
    from ontology_mapper_spark.operators.stats import zipf_moments

    # counts strictly decreasing with rank -> negative slope
    rows = (
        [("w0",)] * 64 + [("w1",)] * 32 + [("w2",)] * 16 + [("w3",)] * 8
        + [("w4",)] * 4
    )
    out = zipf_moments(spark.createDataFrame(rows, ["w"]), "w").collect()[0]
    assert out["n_types"] == 5
    assert out["slope_micro"] < 0


def test_assortativity_perfect_positive(spark):
    from ontology_mapper_spark.operators.stats import assortativity_moments

    # two disconnected stars of different size: edges in the big star see
    # (deg_src, deg_dst) = (3, 1) and the small star (1, 1) -> r undefined
    # only when degenerate; build a correlated case instead:
    # hub-hub edges + leaf-leaf edges -> x == y on every edge -> r == 1
    edges = spark.createDataFrame(
        [("h1", "H1"), ("h1", "H2"), ("h2", "H1"), ("h2", "H2"), ("l1", "L1")],
        ["src", "dst"],
    )
    out = assortativity_moments(edges).collect()[0]
    assert out["n_edges"] == 5
    assert out["r_micro"] == 1_000_000


def test_pr_sweep_perfect_at_gold_threshold(spark):
    from ontology_mapper_spark.operators.evaluate import pr_sweep

    scored = spark.createDataFrame(
        [("a", 900), ("b", 900), ("c", 500), ("d", 500)], ["k", "score_micro"]
    )
    gold = spark.createDataFrame([("a",), ("b",)], ["k"])
    out = {r["threshold_micro"]: r for r in pr_sweep(scored, gold, ["k"]).collect()}
    # at the top threshold: both predictions are gold -> P = R = F1 = 1
    assert out[900]["precision_micro"] == 1_000_000
    assert out[900]["recall_micro"] == 1_000_000
    assert out[900]["f1_micro"] == 1_000_000
    # at the bottom threshold: 4 predicted, 2 gold -> P = 0.5, R = 1
    assert out[500]["precision_micro"] == 500_000
    assert out[500]["recall_micro"] == 1_000_000
    assert out[500]["f1_micro"] == round(2 * 2 / (4 + 2) * 1e6)


def test_decayed_edges_monotone_in_recency(spark):
    import datetime

    from ontology_mapper_spark.operators.temporal import decayed_edge_weights

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", "old", t0),
        ("u", "new", t0 + datetime.timedelta(days=14)),
        ("u", "new", t0 + datetime.timedelta(days=14, hours=3)),
    ]
    df = spark.createDataFrame(rows, ["src", "dst", "ts"])
    out = {r["dst"]: r for r in decayed_edge_weights(df, "src", "dst").collect()}
    # newest day has age 0 -> weight exactly 1.0 per event
    assert out["new"]["decayed_micro"] == 2_000_000
    assert out["new"]["n_events"] == 2
    # 14 days old at tau=7 -> e^-2 per event
    import math

    assert out["old"]["decayed_micro"] == round(math.exp(-2) * 1e6)


def test_gap_candidates_exclude_dictionary(spark):
    from ontology_mapper_spark.operators.textstats import ngram_gap_candidates

    docs = spark.createDataFrame(
        [(1, "hash join beats loop join"), (2, "loop join again")],
        ["doc_id", "text"],
    )
    pats = spark.createDataFrame([("hash join",), ("join",)], ["pattern"])
    out = {r["span"]: r["n"] for r in ngram_gap_candidates(docs, pats).collect()}
    assert "hash join" not in out and "join" not in out
    assert out["loop join"] == 2  # bigram counted across docs
    assert out["loop"] == 2 and out["beats"] == 1


def test_pair_set_metrics_counts(spark):
    from ontology_mapper_spark.operators.evaluate import pair_set_metrics

    cand = spark.createDataFrame([(1, 2), (1, 3), (4, 5)], ["id_a", "id_b"])
    truth = spark.createDataFrame([(1, 2), (4, 5), (6, 7)], ["id_a", "id_b"])
    out = pair_set_metrics(cand, truth, ["id_a", "id_b"]).collect()[0]
    assert (out["n_truth"], out["n_cand"], out["n_hit"]) == (3, 3, 2)
    assert out["recall_micro"] == round(2 / 3 * 1e6)
    assert out["precision_micro"] == round(2 / 3 * 1e6)


def test_wilson_bounds_bracket_rate(spark):
    from ontology_mapper_spark.operators.stats import wilson_bounds

    rows = [("big", i < 30) for i in range(300)] + [("small", i < 1) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "defect"])
    out = {r["g"]: r for r in wilson_bounds(df, "g", "defect").collect()}
    for r in out.values():
        assert r["wilson_lo_micro"] <= r["rate_micro"] <= r["wilson_hi_micro"]
    # same observed rate, but the small group's interval must be wider
    big = out["big"]; small = out["small"]
    assert big["rate_micro"] == small["rate_micro"] == 100_000
    assert (small["wilson_hi_micro"] - small["wilson_lo_micro"]) > (
        big["wilson_hi_micro"] - big["wilson_lo_micro"]
    )


def test_chi2_zero_for_independent_table(spark):
    from ontology_mapper_spark.operators.stats import chi2_contingency

    # perfectly proportional table -> every cell term is exactly 0
    rows = []
    for s, mult in (("train", 8), ("test", 2)):
        rows += [(s, "a")] * (10 * mult) + [(s, "b")] * (5 * mult)
    df = spark.createDataFrame(rows, ["split", "src"])
    out = chi2_contingency(df, "split", "src").collect()[0]
    assert out["chi2_micro"] == 0
    assert out["dof"] == 1
    skewed = spark.createDataFrame(
        [("train", "a")] * 20 + [("test", "b")] * 20, ["split", "src"]
    )
    assert chi2_contingency(skewed, "split", "src").collect()[0]["chi2_micro"] > 0


def test_cluster_size_profile_with_singletons(spark):
    from ontology_mapper_spark.operators.dedup import cluster_size_profile

    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["doc_id", "cluster_rep"]
    )
    universe = spark.createDataFrame([(i,) for i in range(1, 11)], ["doc_id"])
    out = {r["cluster_size"]: r for r in
           cluster_size_profile(assignments, universe).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 5 and out[1]["n_docs"] == 5  # 4,5,6,9,10
    assert sum(r["n_docs"] for r in out.values()) == 10
