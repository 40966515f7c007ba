"""Tests for the qa93-qa97 wave: Krippendorff's alpha, PQ codebook
audit, SPRT monitor, readability, and rank-biased overlap."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ontology_mapper_spark.operators.evaluate import (
    krippendorff_alpha_nominal,
    rbo_truncated,
    rbo_weights_micro,
)
from ontology_mapper_spark.operators.similarity import pq_codebook_report
from ontology_mapper_spark.operators.temporal import (
    sprt_daily_audit,
    sprt_wald_bounds_micro,
)
from ontology_mapper_spark.operators.textstats import readability_scores

MICRO = 1_000_000


# ------------------------------------------------------------- krippendorff


def _ratings(spark, rows):
    return spark.createDataFrame(rows, "item long, rater string, label int")


def test_krippendorff_perfect_agreement_is_one(spark):
    rows = [(i, r, i % 3) for i in range(30) for r in ("a", "b", "c")]
    out = krippendorff_alpha_nominal(_ratings(spark, rows)).collect()[0]
    assert out.do_micro == 0
    assert out.alpha_micro == MICRO
    assert out.n_items == 30 and out.n_ratings == 90


def test_krippendorff_constant_label_has_null_alpha(spark):
    rows = [(i, r, 1) for i in range(10) for r in ("a", "b")]
    out = krippendorff_alpha_nominal(_ratings(spark, rows)).collect()[0]
    assert out.de_micro == 0 and out.alpha_micro is None


def test_krippendorff_single_rating_items_drop(spark):
    rows = [(1, "a", 0), (1, "b", 0), (2, "a", 1)]  # item 2 unpairable
    out = krippendorff_alpha_nominal(_ratings(spark, rows)).collect()[0]
    assert out.n_items == 1 and out.n_ratings == 2


def test_krippendorff_matches_hand_computation(spark):
    # classic 2-rater binary example: 3 agree-0, 3 agree-1, 2 disagree
    rows = []
    i = 0
    for _ in range(3):
        rows += [(i, "a", 0), (i, "b", 0)]
        i += 1
    for _ in range(3):
        rows += [(i, "a", 1), (i, "b", 1)]
        i += 1
    for _ in range(2):
        rows += [(i, "a", 0), (i, "b", 1)]
        i += 1
    out = krippendorff_alpha_nominal(_ratings(spark, rows)).collect()[0]
    # n=16, n_0=8, n_1=8; Do = (2 items * 2 disagreeing pairs/2)/16... use
    # the formula: per disagreeing item: sum r_uc(m-r_uc)/(m-1) = 1*1+1*1 = 2
    # Do = (2 items * 2e6) / 16 = 250000; De = (8*8+8*8)*1e6/(16*15) = 533333
    assert out.do_micro == 250_000
    assert out.de_micro == 533_333
    expected = round((out.de_micro - out.do_micro) * MICRO / out.de_micro)
    assert out.alpha_micro == expected


# ----------------------------------------------------------------------- pq


def test_pq_codebook_shapes_and_balance(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_codebook_report(df, "vec_id", "embedding", 4, 8, 16).collect()
    subs = {r.subspace for r in out}
    assert subs == {0, 1, 2, 3}
    # every vector lands in exactly one code per subspace
    per_ss = {}
    for r in out:
        per_ss[r.subspace] = per_ss.get(r.subspace, 0) + r.n_assigned
        assert 1 <= r.code <= 8
        assert r.sum_sq_dist >= 0
    assert all(v == 200 for v in per_ss.values())
    # shares sum to ~1e6 within each subspace
    for s in range(4):
        tot = sum(r.share_micro for r in out if r.subspace == s)
        assert abs(tot - MICRO) <= 8


def test_pq_seed_vectors_have_zero_self_distortion(spark):
    # with n_codes == n_vectors every vector is its own codeword
    rows = [(i, [float(i)] * 64) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_codebook_report(df, "vec_id", "embedding", 4, 8, 16).collect()
    assert all(r.sum_sq_dist == 0 for r in out)


# --------------------------------------------------------------------- sprt


def test_sprt_bounds_are_symmetric_ln19():
    up, lo = sprt_wald_bounds_micro(5, 5)
    assert up == round(MICRO * math.log(19)) == -lo


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, hit long")


def test_sprt_detects_a_big_lift(spark):
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # baseline half: 10% success; post half: 30% success over 5 days
    for d in range(5):
        for i in range(200):
            rows.append((t0 + dt.timedelta(days=d, seconds=i), 1 if i % 10 == 0 else 0))
    for d in range(5, 10):
        for i in range(200):
            rows.append((t0 + dt.timedelta(days=d, seconds=i), 1 if i % 10 < 3 else 0))
    out = sprt_daily_audit(_events(spark, rows), "ts", F.col("hit")).collect()
    assert len(out) == 5
    assert [r.day for r in out] == sorted(r.day for r in out)
    # cumulative LLR is a running sum of the daily increments
    acc = 0
    for r in out:
        acc += r.llr_day_micro
        assert r.cum_llr_micro == acc
    assert out[-1].decision == "accept_h1"


def test_sprt_null_effect_keeps_continuing_or_accepts_h0(spark):
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for d in range(10):
        for i in range(100):
            rows.append((t0 + dt.timedelta(days=d, seconds=i), 1 if i % 5 == 0 else 0))
    out = sprt_daily_audit(_events(spark, rows), "ts", F.col("hit")).collect()
    assert all(r.decision in ("continue", "accept_h0") for r in out)


def test_sprt_degenerate_baseline_returns_empty(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(hours=i), 0) for i in range(48)]  # p0 = 0
    assert sprt_daily_audit(_events(spark, rows), "ts", F.col("hit")).count() == 0


# -------------------------------------------------------------- readability


def test_readability_simple_sentence(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat on the mat.")], "doc_id long, text string"
    )
    out = readability_scores(df, "text", "doc_id").collect()[0]
    assert out.n_words == 6 and out.n_sentences == 1
    # vowel groups: e,a,a,o,e,a -> 6
    assert out.n_syllables == 6
    fre = 206_835_000 - round(6 * 1_015_000 / 1) - round(6 * 84_600_000 / 6)
    assert out.fre_micro == fre


def test_readability_drops_wordless_docs_and_floors_sentences(spark):
    df = spark.createDataFrame(
        [(1, "   "), (2, "no terminator here")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in readability_scores(df, "text", "doc_id").collect()}
    assert 1 not in out  # whitespace-only doc has no words
    assert out[2].n_sentences == 1  # floored


def test_readability_harder_text_scores_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "I like tea. It is hot. We sip it."),
            (2, "Incomprehensible organizational restructuring methodologies proliferate unnecessarily."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(df, "text", "doc_id").collect()}
    assert out[1].fre_micro > out[2].fre_micro
    assert out[1].fkgl_micro < out[2].fkgl_micro


# ---------------------------------------------------------------------- rbo


def _rank(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, rank int")


def test_rbo_identical_rankings_hit_weight_total(spark):
    rows = [("g", i, i) for i in range(1, 11)]
    out = rbo_truncated(_rank(spark, rows), _rank(spark, rows), "g", "id").collect()[0]
    assert out.n_common_at_k == 10
    # identical lists: overlap_d = d at every depth -> score = sum w_d*d/d
    # = sum of per-depth weights = suffix[1] computed from item weights m=rank
    w = rbo_weights_micro(10)
    suffix = [0] * 12
    for d in range(10, 0, -1):
        suffix[d] = suffix[d + 1] + w[d - 1]
    assert out.rbo_micro == sum(suffix[m] for m in range(1, 11))


def test_rbo_disjoint_rankings_score_zero(spark):
    a = _rank(spark, [("g", i, i) for i in range(1, 11)])
    b = _rank(spark, [("g", 100 + i, i) for i in range(1, 11)])
    out = rbo_truncated(a, b, "g", "id").collect()[0]
    assert out.n_common_at_k == 0 and out.rbo_micro == 0


def test_rbo_head_agreement_beats_tail_agreement(spark):
    base = [("g", i, i) for i in range(1, 11)]
    # swap in foreign items at the TAIL vs at the HEAD
    tail_diff = [("g", i if i <= 5 else 100 + i, i) for i in range(1, 11)]
    head_diff = [("g", i if i > 5 else 100 + i, i) for i in range(1, 11)]
    a = _rank(spark, base)
    t = rbo_truncated(a, _rank(spark, tail_diff), "g", "id").collect()[0]
    h = rbo_truncated(a, _rank(spark, head_diff), "g", "id").collect()[0]
    assert t.rbo_micro > h.rbo_micro


def test_rbo_groups_missing_from_match_report_zero(spark):
    a = _rank(spark, [("g", 1, 1), ("h", 2, 1)])
    b = _rank(spark, [("g", 1, 1), ("h", 3, 1)])
    out = {r.g: r for r in rbo_truncated(a, b, "g", "id").collect()}
    assert out["h"].rbo_micro == 0 and out["g"].rbo_micro > 0
