"""Hand-computed checks for entropy / KS / Gini."""

import math

from ontology_mapper_spark.operators.stats import (
    gini_concentration,
    ks_drift,
    token_entropy,
)


def test_token_entropy_uniform_and_point(spark):
    rows = [("u", f"w{i}") for i in range(8)] + [("p", "same")] * 8
    df = spark.createDataFrame(rows, "g string, w string")
    out = {r["g"]: r for r in token_entropy(df, "g", "w").collect()}
    # uniform over 8 -> ln 8; point mass -> 0
    assert abs(out["u"]["entropy_micro"] - round(math.log(8) * 1e6)) <= 8
    assert out["p"]["entropy_micro"] == 0
    assert out["u"]["n_types"] == 8 and out["p"]["n_types"] == 1


def test_ks_drift_identical_and_disjoint(spark):
    # group "a" == global shape contribution; "b" shifted
    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [
        ("b", float(v)) for v in [11, 12, 13, 14]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    # each group holds half the mass, fully separated:
    # at v=4: F_a=1, F_all=0.5 -> D=0.5 exactly (ks_num = 4*8-4*4 = 16)
    assert out["a"]["ks_num"] == 16 and out["a"]["ks_micro"] == 500000
    assert out["b"]["ks_num"] == 16 and out["b"]["ks_micro"] == 500000


def test_gini_equal_and_skewed(spark):
    rows = [("eq", i, 10) for i in range(4)] + [
        ("sk", 0, 0),
        ("sk", 1, 0),
        ("sk", 2, 0),
        ("sk", 3, 100),
    ]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    out = {r["g"]: r for r in gini_concentration(df, "g", "x", "id").collect()}
    assert out["eq"]["gini_micro"] == 0
    # one holder of everything among 4: G = (2*4*100 - 5*100)/(4*100) = 0.75
    assert out["sk"]["gini_micro"] == 750000


def test_cohens_kappa_hand_computed(spark):
    from ontology_mapper_spark.operators.stats import cohens_kappa

    # g1: cells (x,x)x2 (x,y) (y,y): n=4 agree=3, rows x3 y1, cols x2 y2,
    # pe = 3*2+1*2 = 8, kappa = (12-8)/(16-8) = 0.5
    # g2: perfect marginal determinism -> den 0 -> kappa null
    rows = [
        ("g1", "x", "x"), ("g1", "x", "x"), ("g1", "x", "y"), ("g1", "y", "y"),
        ("g2", "x", "x"), ("g2", "x", "x"),
    ]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    out = {r["g"]: r for r in cohens_kappa(df, "g", "a", "b").collect()}
    assert out["g1"]["n_docs"] == 4 and out["g1"]["n_agree"] == 3
    assert out["g1"]["pe_num"] == 8 and out["g1"]["kappa"] == 0.5
    assert out["g2"]["kappa"] is None and out["g2"]["pe_num"] == 4


def test_cohens_kappa_disjoint_labels(spark):
    from ontology_mapper_spark.operators.stats import cohens_kappa

    # a-labels and b-labels never overlap: agree=0, pe=0, kappa = 0/n² = 0
    rows = [("g", "p", "q"), ("g", "p", "r")]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    r = cohens_kappa(df, "g", "a", "b").first()
    assert r["n_agree"] == 0 and r["pe_num"] == 0 and r["kappa"] == 0.0


def test_oov_stats_hand_computed(spark):
    from ontology_mapper_spark.operators.textstats import oov_stats

    rows = [
        (1, "aa aa bb"),      # with vocab_size=2 -> vocab {aa, bb}
        (2, "aa zz yy xx"),   # 3 of 4 OOV
        (3, "   "),           # zero tokens -> absent from output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in oov_stats(df, vocab_size=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_oov"] == 0 and out[1]["oov_micro"] == 0
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 3
    assert out[2]["oov_micro"] == 750000


def test_oov_vocab_is_distributed_topk(spark):
    from ontology_mapper_spark.operators.textstats import oov_stats

    df = spark.createDataFrame([(i, "w%d common" % (i % 7)) for i in range(50)],
                               "doc_id long, text string")
    plan = oov_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k vocab, not a global sort


def test_cross_source_leakage_hand_computed(spark):
    from ontology_mapper_spark.operators.dedup import cross_source_leakage

    rows = [
        (1, "shared  text", "s1"),
        (2, "SHARED text",  "s2"),   # same normalized content, other source
        (3, "only in s1",   "s1"),
        (4, "s2 private",   "s2"),
        (5, "s2 private",   "s2"),   # duplicate WITHIN s2 only: not leaked
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in cross_source_leakage(df).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_leaked"] == 1
    assert out["s1"]["leak_micro"] == 500000
    assert out["s2"]["n_docs"] == 3 and out["s2"]["n_leaked"] == 1


def test_mann_whitney_hand_computed(spark):
    from ontology_mapper_spark.operators.stats import mann_whitney_u

    # A = {1,2}, B = {3,4}: total separation. midranks 1,2,3,4;
    # U_A = R_A - nA(nA+1)/2 = 3 - 3 = 0 -> u2 = 0, auc = 0
    rows = [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mann_whitney_u(df, "g", "v").collect()}
    assert out["A"]["u2"] == 0 and out["A"]["auc_micro"] == 0
    assert out["B"]["u2"] == 8 and out["B"]["auc_micro"] == 1000000

    # ties: A = {1,1}, B = {1,3}. doubled midranks: value 1 spans ranks
    # 1..3 -> dmid 2*0+3+1 = 4; value 3 -> dmid 2*3+1+1 = 8.
    # R2_A = 8, u2_A = 8 - 6 = 2 -> U_A = 1, auc = U/(nA*nB) = 1/4
    rows = [("A", 1.0), ("A", 1.0), ("B", 1.0), ("B", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mann_whitney_u(df, "g", "v").collect()}
    assert out["A"]["u2"] == 2 and out["A"]["auc_micro"] == 250000
    # U_A + U_B = nA*nB
    assert out["A"]["u2"] + out["B"]["u2"] == 2 * 2 * 2


def test_curriculum_interleave_positions(spark):
    from ontology_mapper_spark.operators.split import curriculum_interleave

    rows = [(i, "s%d" % (i % 3), (i * 37) % 100) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = curriculum_interleave(df).collect()
    # positions unique; first n_sources positions are each source's easiest
    pos = [r["global_pos"] for r in out]
    assert len(pos) == len(set(pos)) == 30
    first3 = sorted(out, key=lambda r: r["global_pos"])[:3]
    assert {r["source"] for r in first3} == {"s0", "s1", "s2"}
    assert all(r["rank_in_source"] == 0 for r in first3)
    # within a source, global order follows the easy->hard rank
    s0 = sorted([r for r in out if r["source"] == "s0"], key=lambda r: r["global_pos"])
    assert [r["rank_in_source"] for r in s0] == list(range(len(s0)))
