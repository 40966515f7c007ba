"""Unit tests for the round-4 operator wave: McNemar, Cochran-Armitage,
predicate cardinality, link margins, conformal coverage, MCC."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.evaluate import (
    conformal_split_coverage,
    mcc_binary,
    mcnemar_test,
)
from ontology_mapper_spark.operators.kgaudit import (
    link_margins,
    predicate_cardinality,
)
from ontology_mapper_spark.operators.stats import cochran_armitage_trend


def test_mcnemar_counts_and_chi2(spark):
    # b = 3 (A right, B wrong), c = 1 -> chi2 = (3-1)^2/4 = 1.0
    rows = (
        [(True, True)] * 2
        + [(True, False)] * 3
        + [(False, True)] * 1
        + [(False, False)] * 4
    )
    df = spark.createDataFrame(rows, "ok_a boolean, ok_b boolean")
    r = mcnemar_test(df, "ok_a", "ok_b").collect()[0]
    assert (r["n_pairs"], r["n_both_correct"], r["n_only_a"],
            r["n_only_b"], r["n_both_wrong"]) == (10, 2, 3, 1, 4)
    assert r["chi2_micro"] == 1_000_000
    # no discordant pairs -> NULL chi2
    df2 = spark.createDataFrame([(True, True), (False, False)],
                                "ok_a boolean, ok_b boolean")
    assert mcnemar_test(df2, "ok_a", "ok_b").collect()[0]["chi2_micro"] is None


def test_mcc_perfect_and_inverse(spark):
    perfect = spark.createDataFrame(
        [(True, True)] * 5 + [(False, False)] * 5, "p boolean, y boolean"
    )
    assert mcc_binary(perfect, "p", "y").collect()[0]["mcc_micro"] == 1_000_000
    inverse = spark.createDataFrame(
        [(True, False)] * 5 + [(False, True)] * 5, "p boolean, y boolean"
    )
    assert mcc_binary(inverse, "p", "y").collect()[0]["mcc_micro"] == -1_000_000
    degenerate = spark.createDataFrame(
        [(True, True)] * 5, "p boolean, y boolean"
    )
    assert mcc_binary(degenerate, "p", "y").collect()[0]["mcc_micro"] is None


def test_cochran_armitage_sign_and_null(spark):
    # success rate rises with dose -> positive trend
    rows = []
    for dose, k in [(0, 1), (1, 3), (2, 5), (3, 7)]:
        rows += [("g", dose, True)] * k + [("g", dose, False)] * (10 - k)
    df = spark.createDataFrame(rows, "g string, dose int, hit boolean")
    r = cochran_armitage_trend(df, "g", "dose", "hit").collect()[0]
    assert r["trend_sign"] == 1 and r["z2_micro"] > 0
    assert (r["n_total"], r["n_success"], r["n_doses"]) == (40, 16, 4)
    # all successes -> NULL z2 (variance degenerate)
    allhit = spark.createDataFrame(
        [("g", 0, True), ("g", 1, True)], "g string, dose int, hit boolean"
    )
    assert (
        cochran_armitage_trend(allhit, "g", "dose", "hit")
        .collect()[0]["z2_micro"]
        is None
    )


def test_predicate_cardinality_profile(spark):
    triples = spark.createDataFrame(
        [
            # functional predicate: every subject one object
            ("s1", "name", "a"), ("s2", "name", "b"), ("s2", "name", "b"),
            # fan-out predicate
            ("s1", "likes", "x"), ("s1", "likes", "y"), ("s2", "likes", "x"),
        ],
        "subj string, pred string, obj string",
    )
    out = {r["pred"]: r for r in predicate_cardinality(triples).collect()}
    nm = out["name"]
    assert (nm["n_triples"], nm["n_subj"], nm["n_obj"],
            nm["n_subj_functional"]) == (2, 2, 2, 2)
    assert nm["functionality_micro"] == 1_000_000
    lk = out["likes"]
    assert (lk["n_triples"], lk["n_subj"], lk["n_subj_functional"]) == (3, 2, 1)
    assert lk["functionality_micro"] == 500_000
    assert lk["fanout_micro"] == 1_500_000


def test_link_margins_fixture(spark):
    from ontology_mapper_spark.kg_fixture import decision_rows, terms_df
    from ontology_mapper_spark.pipeline.link_score import rank_dictionary

    out = {
        r["pattern"]: r
        for r in link_margins(
            rank_dictionary(spark, terms_df(spark), idf=None)
        ).collect()
    }
    # python mirror agrees on candidate counts and margins
    by_pat = {}
    for r in decision_rows():
        by_pat.setdefault(r["pattern"], []).append(r)
    assert set(out) == set(by_pat)
    for pat, rows in by_pat.items():
        rows.sort(key=lambda r: r["rank"])
        assert out[pat]["n_cands"] == len(rows)
        assert out[pat]["top_score_micro"] == rows[0]["score_micro"]
        if len(rows) >= 2:
            assert (
                out[pat]["margin_micro"]
                == rows[0]["score_micro"] - rows[1]["score_micro"]
            )
        else:
            assert out[pat]["margin_micro"] is None
            assert out[pat]["ambiguous"] is False


def test_conformal_coverage_quantile_exact(spark):
    # deterministic check against a brute-force mirror of the same split
    import hashlib

    rows = [(i, (i * 37) % 101 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    out = conformal_split_coverage(
        df, "score", "doc_id", alpha_micro=100_000,
        cal_fraction_micro=500_000, salt="conformal",
    ).collect()[0]
    thr = (500_000 << 40) // 1_000_000
    cal, test = [], []
    for i, s in rows:
        h = int(hashlib.md5(f"conformal{i}".encode()).hexdigest()[:10], 16)
        (cal if h < thr else test).append(s)
    cal.sort()
    k = min(((len(cal) + 1) * 900_000 + 999_999) // 1_000_000, len(cal))
    qhat = cal[k - 1]
    covered = sum(1 for s in test if s <= qhat)
    assert (out["n_cal"], out["n_test"]) == (len(cal), len(test))
    assert out["rank_k"] == k and out["q_hat"] == qhat
    assert out["n_covered"] == covered
    # conformal guarantee: coverage >= 1 - alpha in expectation; at this
    # n it should land well above 80%
    assert out["coverage_micro"] >= 800_000
