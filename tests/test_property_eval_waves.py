"""Hypothesis property tests for the session's evaluation/preference
waves (qa89-qb07): invariants unit cases can't pin — scale invariance,
bounds, order invariance, budget conservation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

MICRO = 1_000_000

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(0, 3), min_size=3, max_size=10
    )
)
def test_ndcg_bounded_and_maximal_on_sorted_rels(spark, rels):
    from ontology_mapper_spark.operators.evaluate import ndcg_at_k

    rows = [("g", r + 1, rel) for r, rel in enumerate(rels)]
    df = spark.createDataFrame(rows, "g string, rank int, rel int")
    out = ndcg_at_k(df, "g", "rank", "rel", k=10).collect()[0]
    if out.idcg_micro == 0:
        assert out.ndcg_micro is None
        return
    assert 0 <= out.ndcg_micro <= MICRO
    # re-ranking by descending relevance must achieve exactly 1.0
    ideal = [("g", r + 1, rel) for r, rel in enumerate(sorted(rels, reverse=True))]
    df2 = spark.createDataFrame(ideal, "g string, rank int, rel int")
    assert ndcg_at_k(df2, "g", "rank", "rel", k=10).collect()[0].ndcg_micro == MICRO


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
        min_size=5,
        max_size=40,
    ).filter(lambda ps: any(w != l for w, l in ps))
)
def test_bradley_terry_shares_sum_and_respect_domination(spark, duels):
    from ontology_mapper_spark.operators.preference import (
        bradley_terry_strengths,
        duel_matrix,
    )

    duels = [(w, l) for w, l in duels if w != l]
    df = spark.createDataFrame(duels, "winner string, loser string")
    out = bradley_terry_strengths(duel_matrix(df)).collect()
    assert all(r.strength_micro >= 1 for r in out)
    # normalized shares sum to 1e6 within per-row rounding slack
    assert abs(sum(r.p_micro for r in out) - MICRO) <= len(out)
    # ranks are a permutation of 1..n
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=12),
    st.lists(st.integers(0, 30), min_size=2, max_size=12),
)
def test_rbo_bounded_by_identical_ranking_score(spark, xs, ys):
    from ontology_mapper_spark.operators.evaluate import (
        rbo_truncated,
        rbo_weights_micro,
    )

    a = spark.createDataFrame(
        [("g", v, r + 1) for r, v in enumerate(dict.fromkeys(xs))],
        "g string, id long, rank int",
    )
    b = spark.createDataFrame(
        [("g", v, r + 1) for r, v in enumerate(dict.fromkeys(ys))],
        "g string, id long, rank int",
    )
    out = rbo_truncated(a, b, "g", "id", k=10).collect()[0]
    w = rbo_weights_micro(10)
    suffix = [0] * 12
    for d in range(10, 0, -1):
        suffix[d] = suffix[d + 1] + w[d - 1]
    max_score = sum(suffix[m] for m in range(1, 11))
    assert 0 <= out.rbo_micro <= max_score


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(1, 1000), min_size=2, max_size=10),
    st.integers(1, 4),
    st.integers(1, 4),
)
def test_mixture_allocation_conserves_budget_and_caps(spark, tokens, num, den):
    from ontology_mapper_spark.operators.mixing import mixture_allocation

    if num > den:
        num, den = den, num
    rows = [(f"s{i}", t, (i * 37) % 11) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(
        rows, "source string, n_tokens long, quality_micro long"
    )
    out = mixture_allocation(df, budget_num=num, budget_den=den).collect()
    total = sum(tokens)
    budget = total * num // den
    assert sum(r.alloc_tokens for r in out) == min(budget, total)
    for r in out:
        assert 0 <= r.alloc_tokens <= r.n_tokens


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1)),
        min_size=4,
        max_size=30,
    )
)
def test_decile_lift_final_tile_is_exactly_neutral(spark, rows):
    from pyspark.sql import functions as F

    from ontology_mapper_spark.operators.evaluate import decile_lift

    data = [(i, s, y) for i, (s, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, s long, y long")
    out = sorted(
        decile_lift(df, "s", F.col("y") == 1, "id", 4).collect(),
        key=lambda r: r.tile,
    )
    if sum(y for _, y in rows) == 0:
        assert all(r.capture_micro is None for r in out)
        return
    # the last tile's cumulative stats cover everything: capture = 1, lift = 1
    assert out[-1].capture_micro == MICRO
    assert out[-1].lift_micro == MICRO
    # capture is monotone nondecreasing across tiles
    caps = [r.capture_micro for r in out]
    assert caps == sorted(caps)


@settings(**_SETTINGS)
@given(st.lists(st.integers(1, 10**6), min_size=4, max_size=12, unique=True))
def test_hill_scale_invariance(spark, xs):
    from ontology_mapper_spark.operators.stats import hill_tail_index

    k = len(xs)
    rows = [("g", x, i) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, x long, id long")
    base = hill_tail_index(df, "g", "x", "id", k=k).collect()[0]
    # Hill depends only on RATIOS x_i/x_k: doubling every value leaves it
    # unchanged (2x is exact in ln: terms shift by ln2 in num and denom
    # equally... actually ratios are literally identical under scaling)
    rows2 = [("g", 2 * x, i) for i, x in enumerate(xs)]
    df2 = spark.createDataFrame(rows2, "g string, x long, id long")
    out2 = hill_tail_index(df2, "g", "x", "id", k=k).collect()[0]
    assert out2.hill_h_micro == base.hill_h_micro
    assert out2.alpha_micro == base.alpha_micro
