"""Tests for the qa89-qa92 wave: Bradley-Terry preference strengths,
NDCG@k, IPS/SNIPS off-policy value, and log-BLEU."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from ontology_mapper_spark.operators.evaluate import (
    ips_policy_value,
    log_bleu,
    ndcg_at_k,
    ndcg_discounts_micro,
)
from ontology_mapper_spark.operators.preference import (
    bradley_terry_strengths,
    duel_matrix,
)

MICRO = 1_000_000


# ---------------------------------------------------------------- preference


def _duels(spark, rows):
    return spark.createDataFrame(rows, "winner string, loser string")


def test_duel_matrix_counts(spark):
    d = _duels(
        spark,
        [("a", "b")] * 3 + [("b", "a")] * 1 + [("b", "c")] * 2,
    )
    cells = {
        (r.item_a, r.item_b): (r.n_duels, r.wins_a)
        for r in duel_matrix(d).collect()
    }
    assert cells == {("a", "b"): (4, 3), ("b", "c"): (2, 2)}


def test_bradley_terry_orders_strengths(spark):
    # a dominates b, b dominates c, a dominates c -> strict order a>b>c
    d = _duels(
        spark,
        [("a", "b")] * 9
        + [("b", "a")] * 1
        + [("b", "c")] * 9
        + [("c", "b")] * 1
        + [("a", "c")] * 10,
    )
    out = {r.item: r for r in bradley_terry_strengths(duel_matrix(d)).collect()}
    assert out["a"].strength_micro > out["b"].strength_micro > out["c"].strength_micro
    assert [out[i].rank for i in ("a", "b", "c")] == [1, 2, 3]
    # normalized shares sum to ~1e6 (each share rounds independently)
    assert abs(sum(r.p_micro for r in out.values()) - MICRO) <= 2
    assert out["a"].n_duels == 20 and out["a"].n_wins == 19


def test_bradley_terry_symmetric_duels_stay_even(spark):
    d = _duels(spark, [("a", "b")] * 5 + [("b", "a")] * 5)
    out = {r.item: r for r in bradley_terry_strengths(duel_matrix(d)).collect()}
    assert out["a"].strength_micro == out["b"].strength_micro
    assert out["a"].p_micro == 500_000


def test_bradley_terry_winless_item_survives(spark):
    # c never wins: strength clamps at the 1-micro floor, no div-by-zero
    d = _duels(spark, [("a", "c")] * 3 + [("b", "c")] * 3 + [("a", "b")] * 2)
    out = {r.item: r for r in bradley_terry_strengths(duel_matrix(d)).collect()}
    assert out["c"].strength_micro >= 1
    assert out["c"].rank == 3


# ---------------------------------------------------------------------- ndcg


def test_ndcg_discount_table_matches_definition():
    dm = ndcg_discounts_micro(10)
    assert dm[0] == MICRO  # position 1: ln2/ln2
    for p, d in enumerate(dm, start=1):
        assert d == round(MICRO * math.log(2) / math.log(p + 1))
    assert dm == sorted(dm, reverse=True)


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "g string, rank int, rel int")


def test_ndcg_perfect_ranking_is_one(spark):
    rows = [("q", r, rel) for r, rel in enumerate([3, 2, 2, 1, 0], start=1)]
    out = ndcg_at_k(_ranked(spark, rows), "g", "rank", "rel", k=5).collect()
    assert out[0].ndcg_micro == MICRO
    assert out[0].mean_ndcg_micro == MICRO


def test_ndcg_worst_ranking_below_one_and_exact(spark):
    rels = [0, 0, 1, 2, 3]
    rows = [("q", r, rel) for r, rel in enumerate(rels, start=1)]
    out = ndcg_at_k(_ranked(spark, rows), "g", "rank", "rel", k=5).collect()[0]
    dm = ndcg_discounts_micro(5)
    dcg = sum(rel * dm[r] for r, rel in enumerate(rels))
    idcg = sum(rel * dm[r] for r, rel in enumerate(sorted(rels, reverse=True)))
    assert out.dcg_micro == dcg and out.idcg_micro == idcg
    assert out.ndcg_micro == round(dcg * MICRO / idcg)
    assert out.ndcg_micro < MICRO


def test_ndcg_zero_relevance_group_is_null_and_excluded_from_mean(spark):
    rows = [("a", 1, 2), ("a", 2, 0), ("z", 1, 0), ("z", 2, 0)]
    out = {r.g: r for r in ndcg_at_k(_ranked(spark, rows), "g", "rank", "rel", k=2).collect()}
    assert out["z"].ndcg_micro is None
    assert out["a"].ndcg_micro == MICRO
    assert out["a"].mean_ndcg_micro == MICRO  # mean over non-null groups only


# ----------------------------------------------------------------------- ips


def test_ips_uniform_logging_recovers_action_mean(spark):
    # one segment, two actions logged 50/50, policy plays 'x'
    rows = [("s", "x", 10)] * 5 + [("s", "y", 2)] * 5
    logged = spark.createDataFrame(rows, "segment string, action string, reward long")
    policy = spark.createDataFrame([("s", "x")], "segment string, action string")
    out = ips_policy_value(logged, policy).collect()[0]
    assert out.n_logged == 10 and out.n_matched == 5
    # w = 10/5 = 2: IPS = sum(10*2e6)/10 = 1e7; SNIPS = mean reward of x = 10
    assert out.ips_value_micro == 10 * MICRO
    assert out.snips_value_micro == 10 * MICRO
    # uniform weights within matched set -> ESS == n_matched
    assert out.ess_micro == 5 * MICRO


def test_ips_no_match_yields_nulls(spark):
    logged = spark.createDataFrame(
        [("s", "x", 1)], "segment string, action string, reward long"
    )
    policy = spark.createDataFrame([("s", "zzz")], "segment string, action string")
    out = ips_policy_value(logged, policy).collect()[0]
    assert out.n_matched == 0
    assert out.ips_value_micro == 0
    assert out.snips_value_micro is None and out.ess_micro is None


# ------------------------------------------------------------------ log-bleu


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "pair_id string, ref_text string, hyp_text string")


def test_log_bleu_identical_text_scores_zero(spark):
    out = log_bleu(_pairs(spark, [("p", "the cat sat here", "the cat sat here")])).collect()[0]
    assert out.clip1 == 4 and out.clip2 == 3
    assert out.bp_micro == 0
    assert out.logp1_micro == 0 and out.logp2_micro == 0
    assert out.log_bleu_micro == 0


def test_log_bleu_disjoint_text_is_very_negative(spark):
    out = log_bleu(_pairs(spark, [("p", "aa bb cc", "xx yy zz")])).collect()[0]
    assert out.clip1 == 0 and out.clip2 == 0
    expected = round(500_000 * math.log(1 / 4)) + round(500_000 * math.log(1 / 3))
    assert out.log_bleu_micro == expected


def test_log_bleu_brevity_penalty_applies_only_to_short_hyp(spark):
    long_hyp = log_bleu(
        _pairs(spark, [("p", "a b", "a b c d")])
    ).collect()[0]
    short_hyp = log_bleu(
        _pairs(spark, [("p", "a b c d", "a b")])
    ).collect()[0]
    assert long_hyp.bp_micro == 0  # hyp longer than ref: no penalty
    assert short_hyp.bp_micro == round(MICRO * (1 - 4 / 2))


def test_log_bleu_drops_empty_sides(spark):
    out = log_bleu(_pairs(spark, [("p", "   ", "a b"), ("q", "a", "a")])).collect()
    assert [r.pair_id for r in out] == ["q"]


def test_log_bleu_clip_caps_repeated_grams(spark):
    # hyp repeats 'a' 4x but ref has it twice -> clip1 = 2
    out = log_bleu(_pairs(spark, [("p", "a b a", "a a a a")])).collect()[0]
    assert out.clip1 == 2
    # ref bigrams {a b, b a}; hyp bigrams {a a}x3 -> no overlap
    assert out.clip2 == 0


def test_log_bleu_clip2_exact(spark):
    out = log_bleu(_pairs(spark, [("p", "a a b", "a a a")])).collect()[0]
    # ref bigrams {a a, a b}, hyp {a a, a a} -> clip2 = min(2,1) = 1
    assert out.clip2 == 1
