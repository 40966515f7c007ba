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


def test_holm_and_bh_rejections(spark):
    """Holm stops at the first failure; BH rejects through the largest
    passing rank — compared against a straight Python mirror using the
    same injected crit tables."""
    from ontology_mapper_spark.operators.multtest import (
        bh_crit_rows,
        bh_rejections,
        holm_crit_rows,
        holm_rejections,
    )

    # z2 values straddling the alpha=0.05 crit range (crit2(d=1)~3.84e6)
    tests = spark.createDataFrame(
        [("a", 30_000_000), ("b", 9_000_000), ("c", 4_000_000),
         ("d", 3_000_000), ("e", None)],
        "g string, z2_micro long",
    )
    m = 5
    holm = {r["g"]: r for r in holm_rejections(tests, "g").collect()}
    bh = {r["g"]: r for r in bh_rejections(tests, "g").collect()}
    hc = dict(holm_crit_rows())
    bc = {(mm, k): c for mm, k, c in bh_crit_rows()}
    z = {"a": 30_000_000, "b": 9_000_000, "c": 4_000_000,
         "d": 3_000_000, "e": None}
    order = ["a", "b", "c", "d", "e"]
    # python Holm
    rej, alive = {}, True
    for i, g in enumerate(order, 1):
        ok = z[g] is not None and z[g] >= hc[m - i + 1]
        alive = alive and ok
        rej[g] = alive
    assert {g: holm[g]["reject"] for g in order} == rej
    # python BH
    kstar = 0
    for i, g in enumerate(order, 1):
        if z[g] is not None and z[g] >= bc[(m, i)]:
            kstar = i
    assert {g: bh[g]["reject"] for g in order} == {
        g: (i <= kstar) for i, g in enumerate(order, 1)
    }
    # the step rules genuinely differ from naive per-test thresholds
    assert holm["a"]["rank"] == 1 and bh["e"]["reject"] is False


def test_required_n_two_proportions(spark):
    from statistics import NormalDist

    from ontology_mapper_spark.operators.multtest import (
        required_n_two_proportions,
    )

    rows = [("x", True)] * 60 + [("x", False)] * 40 + \
           [("y", True)] * 40 + [("y", False)] * 60
    df = spark.createDataFrame(rows, "g string, hit boolean")
    out = {r["g"]: r for r in
           required_n_two_proportions(df, "g", "hit").collect()}
    p1, p2 = 0.6, 0.4
    za = NormalDist().inv_cdf(0.975)
    zb = NormalDist().inv_cdf(0.8)
    import math
    pbar = (p1 + p2) / 2
    root = za * math.sqrt(2 * pbar * (1 - pbar)) + zb * math.sqrt(
        p1 * (1 - p1) + p2 * (1 - p2)
    )
    expect = math.ceil((root * root) / ((p1 - p2) * (p1 - p2)))
    assert out["x"]["n_required"] == expect  # ~97 per arm at this effect
    assert out["x"]["p1_micro"] == 600_000
    # equal rates -> NULL
    eq = spark.createDataFrame(
        [("x", True), ("x", False), ("y", True), ("y", False)],
        "g string, hit boolean",
    )
    assert all(
        r["n_required"] is None
        for r in required_n_two_proportions(eq, "g", "hit").collect()
    )


def test_jsd_identical_and_disjoint(spark):
    from ontology_mapper_spark.operators.stats import jsd_from_reference

    # two identical sources -> each source dist == corpus dist -> JSD 0
    rows = [("a", w) for w in "x y z x".split()] + [
        ("b", w) for w in "x y z x".split()
    ]
    df = spark.createDataFrame(rows, "g string, w string")
    out = {r["g"]: r["jsd_micro"] for r in
           jsd_from_reference(df, "g", "w").collect()}
    assert out == {"a": 0, "b": 0}
    # fully disjoint vocabularies: the reference is the CORPUS (a 50/50
    # mixture containing the source), so JSD(source||corpus) =
    # [ln(4/3) + (ln(2/3) + ln 2)/2] / 2 ~= 0.215761 — NOT ln 2 (that
    # bound needs two disjoint distributions, not source-vs-mixture)
    import math

    rows2 = [("a", "x")] * 50 + [("b", "y")] * 50
    out2 = {r["g"]: r["jsd_micro"] for r in
            jsd_from_reference(
                spark.createDataFrame(rows2, "g string, w string"), "g", "w"
            ).collect()}
    expect = round(
        (math.log(4 / 3) + (math.log(2 / 3) + math.log(2)) / 2) / 2 * 1e6
    )
    for v in out2.values():
        assert abs(v - expect) <= 2  # per-term micro rounding slack


def test_shrunk_rates_winners_curse(spark):
    from ontology_mapper_spark.operators.stats import shrunk_rates

    # bulk drags the pooled rate to ~17%: tiny (3/3) shrinks hard toward
    # it while big (900/1000) barely moves — the leaderboard must flip
    rows = (
        [("tiny", True)] * 3
        + [("big", True)] * 900
        + [("big", False)] * 100
        + [("bulk", True)] * 1000
        + [("bulk", False)] * 9000
    )
    df = spark.createDataFrame(rows, "g string, hit boolean")
    out = {r["g"]: r for r in
           shrunk_rates(df, "g", "hit", prior_strength=100).collect()}
    # raw would rank tiny (100%) over big (90%); shrinkage must flip it
    assert out["tiny"]["raw_micro"] == 1_000_000
    assert out["big"]["rank"] == 1 and out["tiny"]["rank"] == 2
    # exact integer mirror of the posterior
    pool = round(1903 * 1_000_000 / 11003)
    assert out["tiny"]["shrunk_micro"] == round(
        (3 * 1_000_000 + 100 * pool) / 103
    )


def test_changepoint_finds_level_shift(spark):
    from ontology_mapper_spark.operators.temporal import (
        changepoint_binary_seg,
    )

    rows = []
    for d in range(20):
        n = 10 if d < 12 else 50
        for i in range(n):
            rows.append((d * 86_400_000_000 + i,))
    df = spark.createDataFrame(rows, "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    r = changepoint_binary_seg(df, "ts").collect()[0]
    assert r["split_day"] == "1970-01-12"  # last day of the left segment
    assert r["n_days_left"] == 12 and r["n_days_right"] == 8
    assert r["mean_left_micro"] == 10_000_000
    assert r["mean_right_micro"] == 50_000_000


def test_gumbel_return_level_mirror(spark):
    import math

    # 10 days, one event per day, daily max = value
    vals = [10.0, 12.0, 11.0, 20.0, 9.0, 15.0, 13.0, 14.0, 8.0, 16.0]
    rows = [(d * 86_400_000_000 + 1, "a", v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "us long, event_type string, value double").select(
        F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "value"
    )
    from ontology_mapper_spark.operators.stats import gumbel_return_levels

    r = gumbel_return_levels(df, "event_type", "ts", "value", 30).collect()[0]
    xs = [math.floor(v * 1000) for v in vals]
    n = len(xs)
    mean = sum(xs) / n
    var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    beta = math.sqrt(var) * (math.sqrt(6) / math.pi)
    loc = mean - 0.5772156649015329 * beta
    rl = loc + beta * (-math.log(-math.log(1 - 1 / 30)))
    assert r["n_days"] == n and r["max_milli"] == max(xs)
    assert abs(r["return_level_milli"] - round(rl)) <= 1
    # return level for a monthly horizon must exceed the mean
    assert r["return_level_milli"] > r["mean_milli"]


def test_vocabulary_turnover(spark):
    from ontology_mapper_spark.operators.temporal import vocabulary_turnover

    day = 86_400_000_000
    rows = (
        [(0 * day + i, f"u{i}") for i in range(4)]          # day0: u0-u3
        + [(1 * day + i, f"u{i}") for i in range(2, 6)]      # day1: u2-u5
        + [(2 * day + i, f"u{i}") for i in range(10, 12)]    # day2: disjoint
    )
    df = spark.createDataFrame(rows, "us long, e string").select(
        F.timestamp_micros(F.col("us")).alias("ts"), "e"
    )
    out = {r["day"]: r for r in vocabulary_turnover(df, "ts", "e").collect()}
    d1 = out["1970-01-02"]
    assert (d1["n_prev"], d1["n_cur"], d1["n_common"]) == (4, 4, 2)
    assert d1["jaccard_micro"] == round(2 * 1e6 / 6)
    assert d1["new_micro"] == 500_000
    d2 = out["1970-01-03"]
    assert d2["n_common"] == 0 and d2["new_micro"] == 1_000_000


def test_bipartite_cooccurrence(spark):
    from ontology_mapper_spark.operators.graph import bipartite_cooccurrence

    rows = [
        ("u1", "x"), ("u1", "y"), ("u2", "x"), ("u2", "y"), ("u3", "x"),
        ("u3", "z"), ("u1", "x"),  # dup engagement ignored
    ]
    df = spark.createDataFrame(rows, "u string, i string")
    out = {(r["item_a"], r["item_b"]): r
           for r in bipartite_cooccurrence(df, "u", "i").collect()}
    xy = out[("x", "y")]
    assert (xy["n_a"], xy["n_b"], xy["n_common"]) == (3, 2, 2)
    import math
    assert xy["cosine_micro"] == round(2 * 1e6 / math.sqrt(6))
    assert out[("x", "z")]["n_common"] == 1
    assert ("y", "z") not in out  # no shared user


def test_aba_motifs(spark):
    from ontology_mapper_spark.operators.temporal import aba_motifs

    rows = [
        ("u1", "A", 1, 1), ("u1", "B", 2, 2), ("u1", "A", 3, 3),  # ABA
        ("u1", "B", 4, 4),                                         # BAB (overlapping)
        ("u2", "A", 1, 5), ("u2", "A", 2, 6), ("u2", "A", 3, 7),   # AAA: not a motif
    ]
    df = spark.createDataFrame(rows, "u string, t string, s long, id long").select(
        "u", "t", F.timestamp_micros(F.col("s") * 1_000_000).alias("ts"), "id"
    )
    out = {(r["type_a"], r["type_b"]): (r["n_motifs"], r["n_users"])
           for r in aba_motifs(df, "u", "t", "ts", "id").collect()}
    assert out == {("A", "B"): (1, 1), ("B", "A"): (1, 1)}


def test_interarrival_burstiness(spark):
    from ontology_mapper_spark.operators.temporal import (
        interarrival_burstiness,
    )

    # clockwork stream: every gap exactly 10s -> sd=0 -> B = -1
    rows = [("u1", "tick", i * 10_000_000, i) for i in range(10)]
    df = spark.createDataFrame(rows, "u string, t string, us long, id long").select(
        "u", "t", F.timestamp_micros(F.col("us")).alias("ts"), "id"
    )
    r = interarrival_burstiness(df, ["u", "t"], "t", "ts", "id").collect()[0]
    assert r["n_gaps"] == 9
    assert r["mean_gap_us"] == 10_000_000
    assert r["burstiness_micro"] == -1_000_000


def test_stratified_ate_simpsons(spark):
    """Construct a Simpson's-paradox fixture: within each stratum the
    treatment HELPS (+20pts), but treatment concentrates in the
    low-outcome stratum, so the naive pooled difference is negative."""
    from ontology_mapper_spark.operators.stats import stratified_ate

    rows = []
    # stratum L (low base rate 10%/30%): 80 treated, 20 control
    rows += [("L", True, True)] * 24 + [("L", True, False)] * 56
    rows += [("L", False, True)] * 2 + [("L", False, False)] * 18
    # stratum H (high base rate 60%/80%): 20 treated, 80 control
    rows += [("H", True, True)] * 16 + [("H", True, False)] * 4
    rows += [("H", False, True)] * 48 + [("H", False, False)] * 32
    df = spark.createDataFrame(rows, "s string, t boolean, y boolean")
    r = stratified_ate(df, "s", "t", "y").collect()[0]
    assert r["n"] == 200 and r["n_strata_used"] == 2
    assert r["naive_ate_micro"] < 0  # pooled comparison misleads
    assert r["adjusted_ate_micro"] > 0  # within-stratum truth recovered
    # exact: both strata have +20pt effects, weights 100/100 -> +200000
    assert r["adjusted_ate_micro"] == 200_000


def test_lorenz_deciles_concentration(spark):
    from ontology_mapper_spark.operators.stats import lorenz_deciles

    # 90 users with 1 event, 10 users with 91 events -> top tile holds
    # 910 of 1000 events
    rows = [(f"u{i:03d}",) for i in range(90)]
    for i in range(90, 100):
        rows += [(f"u{i:03d}",)] * 91
    df = spark.createDataFrame(rows, "u string").select(
        "u", F.lit(1).alias("w")
    )
    out = {r["tile"]: r for r in lorenz_deciles(df, "u", "w").collect()}
    assert len(out) == 10
    assert out[10]["tile_weight"] == 910 and out[10]["n_units"] == 10
    assert out[1]["tile_weight"] == 10
    assert out[10]["cum_weight_micro"] == 1_000_000
    assert out[9]["cum_weight_micro"] == 90_000


def test_keyword_logodds_contrast(spark):
    from ontology_mapper_spark.operators.stats import keyword_logodds

    rows = [("a", "apple")] * 50 + [("a", "the")] * 50 + \
           [("b", "banana")] * 50 + [("b", "the")] * 50
    df = spark.createDataFrame(rows, "g string, w string")
    out = {(r["g"], r["w"]): r for r in
           keyword_logodds(df, "g", "w", top_k=3).collect()}
    # each group's most characteristic token is its exclusive word,
    # and the shared stopword never outranks it
    assert out[("a", "apple")]["rank"] == 1
    assert out[("b", "banana")]["rank"] == 1
    assert out[("a", "the")]["rank"] > 1
    assert out[("a", "apple")]["z_micro"] > 0
    # only OBSERVED (group, token) rows are scored — a token the group
    # never uses has no row (and 'the', shared 50/50, scores below the
    # exclusive word)
    assert ("a", "banana") not in out
    assert out[("a", "the")]["z_micro"] < out[("a", "apple")]["z_micro"]


def test_marginal_coverage_greedy(spark):
    from ontology_mapper_spark.operators.textstats import marginal_coverage

    rows = [
        (1, "alpha beta gamma delta", "big"),
        (2, "alpha beta gamma delta", "big"),
        (3, "alpha beta epsilon", "mid"),      # adds 'beta epsilon'
        (4, "alpha beta gamma delta", "dup"),  # adds nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           marginal_coverage(df, "text", "source", 2).collect()}
    assert out["big"]["order_idx"] == 1 and out["big"]["n_new"] == 3
    # doc-count tie between 'dup' and 'mid' breaks on name: dup=2, mid=3
    assert out["dup"]["order_idx"] == 2 and out["mid"]["order_idx"] == 3
    assert out["mid"]["n_new"] == 1  # only 'beta epsilon' is new
    assert out["dup"]["n_new"] == 0
    assert out["mid"]["cum_new"] == 4


def test_tokenizer_fertility(spark):
    from ontology_mapper_spark.operators.textstats import tokenizer_fertility

    df = spark.createDataFrame(
        [("en", "hello, world!"), ("en", "one two")],
        "lang string, text string",
    )
    r = tokenizer_fertility(df, "text", "lang").collect()[0]
    # tokens: hello , world ! = 4; one two = 2 -> 6; words: 2 + 2 = 4
    assert (r["n_docs"], r["n_words"], r["n_tokens"]) == (2, 4, 6)
    assert r["fertility_micro"] == 1_500_000


def test_dedup_composition_shift(spark):
    from ontology_mapper_spark.operators.dedup import dedup_composition_shift

    rows = (
        [(i, "same template text", "spam") for i in range(8)]
        + [(100 + i, f"unique doc {i}", "clean") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           dedup_composition_shift(df, "text", "doc_id", "source").collect()}
    assert (out["spam"]["n_before"], out["spam"]["n_after"]) == (8, 1)
    assert (out["clean"]["n_before"], out["clean"]["n_after"]) == (2, 2)
    # spam was 80% of the corpus, is 33% after dedup: shift is negative
    assert out["spam"]["share_before_micro"] == 800_000
    assert out["spam"]["share_after_micro"] == 333_333
    assert out["spam"]["shift_micro"] == -466_667
    assert out["clean"]["kept_micro"] == 1_000_000


def test_deletion_neighborhood_pairs(spark):
    from ontology_mapper_spark.operators.dedup import (
        deletion_neighborhood_pairs,
    )

    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),        # identical: shares 5 variants
        (3, "the quick fox"),              # deletion of 'brown'
        (4, "the quick brown wolf"),       # substitution at last slot
        (5, "a completely different doc"), # unrelated
        (6, "quick brown the fox"),        # reorder: NOT within one edit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["n_shared_variants"]
           for r in deletion_neighborhood_pairs(df, "text", "doc_id").collect()}
    assert out[(1, 2)] == 5          # identical length-4 docs: n+1 variants
    assert out[(1, 3)] == 1          # share exactly the deleted form
    assert out[(1, 4)] == 1          # same-position substitution
    # 3 vs 4: min two edits apart (their deletion neighborhoods are
    # length-2/3 vs length-3/4 with no common string)
    assert (3, 4) not in out
    assert (1, 5) not in out and (2, 5) not in out
    # a single-token MOVE is within the relation: deleting 'the' from
    # each side meets at 'quick brown fox' (SymSpell deletion distance
    # covers moves, unlike Levenshtein-1)
    assert out[(1, 6)] == 1


def test_padding_waste(spark):
    from ontology_mapper_spark.operators.chunking import padding_waste

    # token counts: 2, 5, 9 under the BPE-ish regex
    df = spark.createDataFrame(
        [("one two",), ("a b c d e",), ("w " * 9,)],
        "text string",
    )
    out = {r["bucket"]: r
           for r in padding_waste(df, "text", buckets=(4, 8)).collect()}
    # 2-token doc -> bucket 4 (pad 2); 5- and 9-token docs -> bucket 8
    # (pad 3 / trunc 1)
    assert (out[4]["n_docs"], out[4]["real_tokens"], out[4]["pad_tokens"],
            out[4]["trunc_tokens"]) == (1, 2, 2, 0)
    assert (out[8]["n_docs"], out[8]["real_tokens"], out[8]["pad_tokens"],
            out[8]["trunc_tokens"]) == (2, 13, 3, 1)
    assert out[4]["waste_micro"] == 500_000
    assert out[8]["waste_micro"] == round(3 * 1_000_000 / 16)


def test_ohlc_bars(spark):
    from ontology_mapper_spark.operators.temporal import ohlc_bars

    rows = [
        # same hour, same type; two events share ts -> id breaks the tie
        (1, "2024-01-01 10:00:00", "trade", 5.00),
        (2, "2024-01-01 10:00:00", "trade", 9.00),
        (3, "2024-01-01 10:30:00", "trade", 1.50),
        (4, "2024-01-01 10:59:59", "trade", 7.25),
        (5, "2024-01-01 11:00:00", "trade", 2.00),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    )
    out = {r["bar"]: r
           for r in ohlc_bars(df, "ts", "value", "event_type",
                              "event_id").collect()}
    b10 = out["2024-01-01 10"]
    assert (b10["open_cents"], b10["close_cents"]) == (500, 725)
    assert (b10["high_cents"], b10["low_cents"]) == (900, 150)
    assert (b10["n_events"], b10["volume_cents"]) == (4, 2275)
    assert out["2024-01-01 11"]["open_cents"] == 200


def test_last_touch_attribution(spark):
    from ontology_mapper_spark.operators.temporal import (
        last_touch_attribution,
    )

    rows = [
        # user 1: click then purchase 1h later -> credited to click
        (1, "2024-01-01 09:00:00", 1, "click", 0.0),
        (2, "2024-01-01 10:00:00", 1, "purchase", 10.00),
        # user 1: a later view then purchase -> view (most recent wins)
        (3, "2024-01-01 11:00:00", 1, "view", 0.0),
        (4, "2024-01-01 12:00:00", 1, "purchase", 20.00),
        # user 2: touch 25h before purchase -> outside horizon -> none
        (5, "2024-01-01 00:00:00", 2, "signup", 0.0),
        (6, "2024-01-02 01:00:01", 2, "purchase", 5.00),
        # user 3: purchase with no touch at all -> none
        (7, "2024-01-01 08:00:00", 3, "purchase", 1.00),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    out = {r["touch_type"]: r
           for r in last_touch_attribution(
               df, "ts", "user_id", "event_type", "value", "event_id"
           ).collect()}
    assert (out["click"]["n_conversions"], out["click"]["value_cents"]) \
        == (1, 1000)
    assert (out["view"]["n_conversions"], out["view"]["value_cents"]) \
        == (1, 2000)
    assert (out["none"]["n_conversions"], out["none"]["value_cents"]) \
        == (2, 600)


def test_pivot_count_matrix(spark):
    from ontology_mapper_spark.operators.reshape import pivot_count_matrix

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "zzz")]
    df = spark.createDataFrame(rows, "uid long, kind string")
    out = {r["uid"]: r
           for r in pivot_count_matrix(df, "uid", "kind",
                                       ("a", "b", "c")).collect()}
    assert (out[1]["a"], out[1]["b"], out[1]["c"], out[1]["row_total"]) \
        == (2, 1, 0, 3)
    # undeclared 'zzz' counts toward no column and not toward row_total
    assert (out[2]["a"], out[2]["b"], out[2]["c"], out[2]["row_total"]) \
        == (0, 1, 0, 1)


def test_linear_attribution(spark):
    from ontology_mapper_spark.operators.temporal import linear_attribution

    rows = [
        # user 1: click, view, then purchase -> 500k each, remainder 0
        (1, "2024-01-01 09:00:00", 1, "click", 0.0),
        (2, "2024-01-01 09:30:00", 1, "view", 0.0),
        (3, "2024-01-01 10:00:00", 1, "purchase", 3.00),
        # user 2: three touches -> 333_333 + 333_333 + 333_334 (last)
        (4, "2024-01-02 09:00:00", 2, "click", 0.0),
        (5, "2024-01-02 09:10:00", 2, "view", 0.0),
        (6, "2024-01-02 09:20:00", 2, "signup", 0.0),
        (7, "2024-01-02 10:00:00", 2, "purchase", 9.00),
        # user 3: no touch -> none bucket
        (8, "2024-01-03 08:00:00", 3, "purchase", 1.00),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    out = {r["touch_type"]: r
           for r in linear_attribution(
               df, "ts", "user_id", "event_type", "value", "event_id"
           ).collect()}
    assert out["click"]["credit_micro"] == 500_000 + 333_333
    assert out["view"]["credit_micro"] == 500_000 + 333_333
    assert out["signup"]["credit_micro"] == 333_334  # last gets remainder
    assert out["none"]["credit_micro"] == 1_000_000
    # per-conversion credit sums to exactly 1e6 * n_conversions
    assert sum(r["credit_micro"] for r in out.values()) == 3_000_000
    assert out["click"]["value_micro_cents"] == \
        300 * 500_000 + 900 * 333_333
    assert out["none"]["value_micro_cents"] == 100 * 1_000_000


def test_rfm_segments(spark):
    from ontology_mapper_spark.operators.segment import rfm_segments

    # 5 users, one purchase each on distinct days with distinct value:
    # every metric has 5 distinct values -> scores are a permutation
    rows = [
        (i, f"2024-01-0{i} 10:00:00", i, "purchase", float(i))
        for i in range(1, 6)
    ]
    # give user 5 a second purchase so frequency differs
    rows.append((99, "2024-01-05 11:00:00", 5, "purchase", 1.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    out = rfm_segments(df, "ts", "user_id", "event_type", "value").collect()
    assert sum(r["n_users"] for r in out) == 5
    assert sum(r["total_purchases"] for r in out) == 6
    by_cell = {(r["r_score"], r["f_score"], r["m_score"]): r for r in out}
    # user 5: most recent (r=5), most frequent (f=5), monetary 5.0+1.0=6.0
    # is the max -> m=5
    assert (5, 5, 5) in by_cell
    # user 1: oldest purchase -> r_score 1; f ties at 1 purchase with
    # users 1-4 (cum_before=0 -> score 1); lowest spend -> m 1
    assert (1, 1, 1) in by_cell
    # all scores within 1..5
    assert all(1 <= r[k] <= 5 for r in out
               for k in ("r_score", "f_score", "m_score"))


def test_referential_integrity(spark):
    from ontology_mapper_spark.operators.dq import referential_integrity

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = referential_integrity(
        [("c_p", child, "fk", parent, "pk")]
    ).collect()
    r = out[0]
    assert (r["relation"], r["n_child"], r["n_null_keys"],
            r["n_orphans"]) == ("c_p", 4, 1, 1)
    assert r["orphan_micro"] == round(1 * 1_000_000 / 3)


def test_profile_columns(spark):
    from ontology_mapper_spark.operators.dq import profile_columns

    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", None), (2, None, None)],
        "k long, s string, z string",
    )
    out = {r["column"]: r
           for r in profile_columns(df, ("k", "s", "z")).collect()}
    assert (out["k"]["n_nulls"], out["k"]["n_distinct"]) == (0, 2)
    assert (out["k"]["min_str"], out["k"]["max_str"]) == ("1", "2")
    assert (out["s"]["n_nulls"], out["s"]["n_distinct"]) == (1, 2)
    assert (out["s"]["min_str"], out["s"]["max_str"]) == ("a", "b")
    assert (out["z"]["n_nulls"], out["z"]["n_distinct"]) == (3, 0)
    assert out["z"]["min_str"] is None


def test_hll_rolling_distinct(spark):
    from ontology_mapper_spark.operators.sketch import hll_rolling_distinct

    # 3 consecutive days, users overlap across days
    rows = []
    eid = 0
    for day, users in (("01", [1, 2]), ("02", [2, 3]), ("03", [3, 4])):
        for u in users:
            rows.append((eid, f"2024-01-{day} 12:00:00", u))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long")
    out = {r["window_end"]: r
           for r in hll_rolling_distinct(df, "ts", "user_id",
                                         window_days=2).collect()}
    assert out["2024-01-01"]["n_days"] == 1
    assert out["2024-01-02"]["n_days"] == 2
    assert out["2024-01-02"]["n_exact"] == 3   # {1,2,3}
    assert out["2024-01-03"]["n_exact"] == 3   # {2,3,4}
    # small cardinalities: raw HLL overestimates but must be positive
    assert all(r["hll_est"] >= 1 for r in out.values())


def test_association_rules(spark):
    from ontology_mapper_spark.operators.assoc import association_rules

    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    out = {(r["antecedent"], r["consequent"]): r
           for r in association_rules(df, "user_id", "item").collect()}
    ab = out[("a", "b")]
    # support: users {1,2}; antecedent a in {1,2,3}; consequent b in {1,2}
    assert (ab["n_both"], ab["n_antecedent"], ab["n_consequent"]) == (2, 3, 2)
    assert ab["conf_micro"] == round(2 * 1_000_000 / 3)
    # lift = (2 * 4) / (3 * 2) = 4/3
    assert ab["lift_micro"] == round(2.0 * 4.0 * 1e6 / (3.0 * 2.0))
    ba = out[("b", "a")]
    assert ba["conf_micro"] == 1_000_000  # b-users all have a
    assert ("a", "c") not in out  # n_both = 0 never materializes


def test_binned_quantile_audit(spark):
    from ontology_mapper_spark.operators.sketch import binned_quantile_audit

    # group g: values 0..99 -> p50 exact = 50 (rank ceil(50) = 50th
    # smallest = value 49), p99 = value 98
    rows = [("g", v) for v in range(100)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r["q_pct"]: r
           for r in binned_quantile_audit(
               df, "grp", "v", quantiles=(50, 99), bin_width=16
           ).collect()}
    assert out[50]["exact_value"] == 49   # rank 50 under 1-based asc
    assert out[99]["exact_value"] == 98
    # sketch = upper edge of covering 16-wide bin
    assert out[50]["sketch_value"] == (49 // 16) * 16 + 15
    assert all(0 <= r["err"] < 16 for r in out.values())
    assert out[50]["n"] == 100


def test_degree_assortativity(spark):
    from ontology_mapper_spark.operators.graph import degree_assortativity

    # star: hub s1 -> d1..d4 (deg_s 4 vs deg_d 1), plus s2 -> d1.
    edges = [("s1", f"d{i}") for i in range(1, 5)] + [("s2", "d1")]
    df = spark.createDataFrame(edges, "s string, d string")
    r = degree_assortativity(df, "s", "d").collect()[0]
    assert (r["n_edges"], r["n_src_nodes"], r["n_dst_nodes"]) == (5, 2, 4)
    # hub edges pair high src-degree with low dst-degree -> negative r
    assert r["assortativity_micro"] < 0
    # constant degrees -> null
    const = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "s string, d string"
    )
    r2 = degree_assortativity(const, "s", "d").collect()[0]
    assert r2["assortativity_micro"] is None


def test_greedy_set_cover(spark):
    from ontology_mapper_spark.operators.mixing import greedy_set_cover

    # s1 covers {1,2,3}; s2 covers {3,4}; s3 covers {1,2} (subset of s1)
    rows = [("s1", 1), ("s1", 2), ("s1", 3),
            ("s2", 3), ("s2", 4), ("s3", 1), ("s3", 2)]
    df = spark.createDataFrame(rows, "s string, i long")
    out = greedy_set_cover(df, "s", "i", k=3).collect()
    # round 1: s1 (3 new); round 2: s2 adds {4}; round 3: s3 adds
    # nothing -> dropped, loop stops early
    assert [(r["round"], r["chosen"], r["n_new"], r["cum_covered"])
            for r in out] == [(1, "s1", 3, 3), (2, "s2", 1, 4)]


def test_char_entropy_report(spark):
    import math

    from ontology_mapper_spark.operators.textstats import (
        char_entropy_report,
    )

    df = spark.createDataFrame(
        [(1, "aaaa", "s1"), (2, "abcd", "s1"), (3, "", "s2"),
         (4, "aabb", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r
           for r in char_entropy_report(df, "text", "source",
                                        "doc_id").collect()}
    # doc1 H=0; doc2 H=ln(4); avg over s1 = ln(4)/2 in micro int math
    ln4 = round(math.log(4) * 1e6)
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["avg_entropy_micro"] == ln4 // 2
    assert out["s1"]["low_entropy_docs"] == 2  # both < 2.5 nats
    # s2: empty doc filtered; "aabb": H = ln(4) - (2*ln2+2*ln2)/4
    ln2 = round(math.log(2) * 1e6)
    assert out["s2"]["n_docs"] == 1
    assert out["s2"]["avg_entropy_micro"] == ln4 - (4 * ln2) // 4


def test_event_time_disorder(spark):
    from ontology_mapper_spark.operators.temporal import (
        event_time_disorder,
    )

    # arrival order 1..4; event 3 arrives 100s behind the running max
    rows = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:05:00"),
        (3, "2024-01-01 10:03:20"),   # 100s late vs 10:05
        (4, "2024-01-01 12:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string")
    out = event_time_disorder(df, "ts", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 4
    assert r["p50_disorder_s"] == 0
    assert r["p99_disorder_s"] == 100
    assert r["n_late"] == 0  # 100s < 3600s


def test_half_life_decayed_counts(spark):
    from ontology_mapper_spark.operators.temporal import (
        half_life_decayed_counts,
    )

    rows = (
        [(i, "2024-01-10 10:00:00", "a") for i in range(4)]
        + [(10 + i, "2024-01-09 10:00:00", "a") for i in range(2)]
        + [(20, "2024-01-10 11:00:00", "b")]
    )
    df = spark.createDataFrame(rows, "event_id long, ts string, k string")
    out = {r["k"]: r
           for r in half_life_decayed_counts(df, "ts", "k").collect()}
    # a: 4*2^0 + 2*2^-1 = 5.0 -> 5000 milli; b: 1.0 -> 1000
    assert out["a"]["decayed_milli"] == 5000
    assert out["b"]["decayed_milli"] == 1000
    assert out["a"]["share_micro"] == round(5e6 / 6)
    assert out["a"]["n_total"] == 6


def test_srm_check(spark):
    from ontology_mapper_spark.operators.stats import srm_check

    df = spark.createDataFrame(
        [(u, "t") for u in range(200)], "user_id long, seg string"
    )
    out = srm_check(df, "user_id", "seg").collect()
    r = out[0]
    assert r["n_a"] + r["n_b"] == 200
    assert r["srm_flag"] == 0  # md5 split is balanced
    # degenerate: all units in one arm must fire
    one = spark.createDataFrame(
        [(u, "t") for u in range(50)], "user_id long, seg string"
    )
    import pyspark.sql.functions as F  # noqa

    # construct forced imbalance by duplicating a single arm-a user id
    # is impossible post-distinct; instead check |z| formula directly
    assert abs(r["z_milli"]) <= 3290


def test_hour_dow_profile(spark):
    from ontology_mapper_spark.operators.temporal import hour_dow_profile

    # 1970-01-01 is Thursday -> dow 4 under the Sunday=0 anchor
    df = spark.createDataFrame(
        [(1, "1970-01-01 13:00:00"), (2, "1970-01-04 02:00:00")],
        "event_id long, ts string",
    )
    out = {(r["dow"], r["hour"]): r
           for r in hour_dow_profile(df, "ts").collect()}
    assert (4, 13) in out   # Thursday 13h
    assert (0, 2) in out    # Sunday 2h
    assert out[(4, 13)]["n_obs"] == 1
    # 2 cells, expected = 1*1/2 = 0.5 -> 500000 micro
    assert out[(4, 13)]["expected_micro"] == 500_000


def test_pattern_match_share(spark):
    from ontology_mapper_spark.operators.dialogue import (
        pattern_match_share,
    )

    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "error"), (2, 2, "error"),
        (3, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, o long, act string")
    out = {r["pattern"]: r
           for r in pattern_match_share(
               df, "u", "act", ("o",),
               {"buy": "v[cv]*p", "ee": "ee"}).collect()}
    assert out["buy"]["n_actors"] == 3
    assert out["buy"]["n_match"] == 1      # only user 1: 'vcp'
    assert out["ee"]["n_match"] == 1       # user 2: 'ee'
    assert out["buy"]["share_micro"] == round(1e6 / 3)


def test_time_to_conversion(spark):
    from ontology_mapper_spark.operators.temporal import (
        time_to_conversion,
    )

    rows = [
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:05:00", 1, "purchase"),   # 300s after click
        (3, "2024-01-02 09:00:00", 2, "view"),
        (4, "2024-01-02 09:00:10", 2, "purchase"),   # 10s after view
        (5, "2024-01-03 09:00:00", 3, "purchase"),   # no touch
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    out = {r["touch_type"]: r
           for r in time_to_conversion(df, "ts", "user_id", "event_type",
                                       "event_id").collect()}
    assert out["click"]["mean_s"] == 300
    assert out["click"]["p50_s"] == 300
    assert out["view"]["p90_s"] == 10
    assert "none" not in out and len(out) == 2


def test_feature_hash_collisions(spark):
    from ontology_mapper_spark.operators.sketch import (
        feature_hash_collisions,
    )

    feats = [(f"f{i}",) for i in range(300)]
    df = spark.createDataFrame(feats, "w string")
    out = {r["log2_dims"]: r
           for r in feature_hash_collisions(df, "w", (4, 20)).collect()}
    # 300 features into 16 buckets: everything collides
    assert out[4]["n_features"] == 300
    assert out[4]["n_buckets_used"] <= 16
    assert out[4]["n_collided_features"] == 300
    assert out[4]["collided_share_micro"] == 1_000_000
    # 2^20 buckets: collisions vanishingly rare for 300 features
    assert out[20]["n_collided_features"] <= 4
    assert out[20]["max_bucket_load"] <= 2


def test_rake_keywords(spark):
    from ontology_mapper_spark.operators.textstats import rake_keywords

    df = spark.createDataFrame(
        [(1, "fast join the slow scan"), (2, "fast join")],
        "doc_id long, text string",
    )
    out = {r["word"]: r
           for r in rake_keywords(df, "text", "doc_id",
                                  ("the",), k=10).collect()}
    # doc1 phrases: [fast join] [slow scan]; doc2: [fast join]
    assert out["fast"]["frequency"] == 2
    assert out["fast"]["degree"] == 4      # two phrases of length 2
    assert out["fast"]["score_micro"] == 2_000_000
    assert out["slow"]["degree"] == 2 and out["slow"]["frequency"] == 1


def test_embedding_drift(spark):
    from ontology_mapper_spark.operators.similarity import embedding_drift

    # label x: identical vectors in both halves -> cosine exactly 1e6
    rows = [
        (0, [1.0, 0.0], "x"), (1, [1.0, 0.0], "x"),
        (2, [1.0, 0.0], "x"), (3, [1.0, 0.0], "x"),
        # label y: halves orthogonal -> cosine 0
        (4, [1.0, 0.0], "y"), (5, [0.0, 1.0], "y"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["label"]: r
           for r in embedding_drift(df, dim=2).collect()}
    assert out["x"]["centroid_cosine_micro"] == 1_000_000
    assert out["x"]["drift_micro"] == 0
    assert out["y"]["centroid_cosine_micro"] == 0
    assert out["y"]["n_a"] == 1 and out["y"]["n_b"] == 1


def test_mutual_best_pairs(spark):
    from ontology_mapper_spark.operators.similarity import (
        mutual_best_pairs,
    )

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(1, [0.9, 0.1]), (3, [0.1, 0.9]), (5, [0.8, 0.2])],
        "vec_id long, embedding array<double>",
    )
    out = {(r["id_a"], r["id_b"]): r["cosine_micro"]
           for r in mutual_best_pairs(a, b).collect()}
    # 0<->1 mutual (5 also points at 0 but 0 prefers 1); 2<->3 mutual
    assert set(out) == {(0, 1), (2, 3)}
    import pytest

    big = spark.range(30001).select(
        "id", F.array(F.lit(1.0)).alias("embedding")
    ).withColumnRenamed("id", "vec_id")
    with pytest.raises(ValueError):
        mutual_best_pairs(big, b)


def test_ltv_curve(spark):
    from ontology_mapper_spark.operators.temporal import ltv_curve

    rows = [
        # user 1 first active week 0, purchases in week 0 and week 1
        (1, "1970-01-02 10:00:00", 1, "purchase", 1.00),
        (2, "1970-01-09 10:00:00", 1, "purchase", 2.00),
        # user 2 same cohort (week 0), no purchases
        (3, "1970-01-03 10:00:00", 2, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    out = {(r["cohort_week"], r["age_week"]): r
           for r in ltv_curve(df).collect()}
    r0 = out[("1970-01-01", 0)]
    assert (r0["n_users"], r0["week_cents"], r0["cum_cents"]) == (2, 100, 100)
    r1 = out[("1970-01-01", 1)]
    assert (r1["week_cents"], r1["cum_cents"]) == (200, 300)
    assert r1["cum_per_user_milli"] == round(300 * 1000 / 2)


def test_anomalous_days(spark):
    from ontology_mapper_spark.operators.temporal import anomalous_days

    rows = []
    eid = 0
    # 7 calm days of 10 events, then a 100-event spike
    for d in range(1, 8):
        for _ in range(10):
            rows.append((eid, f"2024-01-{d:02d} 10:00:00")); eid += 1
    for _ in range(100):
        rows.append((eid, "2024-01-08 10:00:00")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string")
    out = {r["day"]: r for r in anomalous_days(df, "ts").collect()}
    assert out["2024-01-01"]["z_milli"] is None     # no trailing window
    spike = out["2024-01-08"]
    # zero trailing variance -> z undefined, null, unflagged? no:
    # identical 10s -> var 0 -> z null -> flag 0
    assert spike["z_milli"] is None and spike["anomaly_flag"] == 0
    # perturb: make one calm day 11 events so variance > 0
    rows.append((eid, "2024-01-07 11:00:00"))
    df2 = spark.createDataFrame(rows, "event_id long, ts string")
    out2 = {r["day"]: r for r in anomalous_days(df2, "ts").collect()}
    assert out2["2024-01-08"]["anomaly_flag"] == 1
    assert out2["2024-01-08"]["z_milli"] > 3000


def test_bloom_fpr_audit(spark):
    from ontology_mapper_spark.operators.bloom import bloom_fpr_audit

    train = spark.createDataFrame(
        [(f"t{i}",) for i in range(200)], "g string"
    )
    probe = spark.createDataFrame(
        [(f"p{i}",) for i in range(200)], "g string"
    )
    out = {(r["log2m"], r["k"]): r
           for r in bloom_fpr_audit(train, probe, "g",
                                    ((6, 2), (16, 4))).collect()}
    tiny = out[(6, 2)]
    # 200 keys x 2 hashes into 64 bits: filter saturates, FPR ~ 1
    assert tiny["fill_micro"] > 900_000
    assert tiny["fpr_micro"] > 900_000
    big = out[(16, 4)]
    assert big["n_probe_neg"] == 200
    assert big["fpr_micro"] < 50_000   # 65536 bits, 200 keys: tiny FPR
    assert big["n_train"] == 200


def test_grouping_sets_query_shape(spark):
    # qb66 uses the native groupingSets API: grand-total row present,
    # grouping_id distinguishes aggregated nulls
    df = spark.createDataFrame(
        [("s1", "en", 10), ("s1", "de", 20), ("s2", "en", 5)],
        "source string, lang string, n_chars long",
    )
    from pyspark.sql import functions as F

    out = df.groupingSets(
        [["source", "lang"], ["source"], ["lang"], []], "source", "lang"
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        (F.grouping("source") * 2 + F.grouping("lang"))
        .cast("long").alias("gid"),
    ).collect()
    total = [r for r in out if r["gid"] == 3]
    assert len(total) == 1 and total[0]["total_chars"] == 35
    by_src = {r["source"]: r for r in out if r["gid"] == 1}
    assert by_src["s1"]["n_docs"] == 2
