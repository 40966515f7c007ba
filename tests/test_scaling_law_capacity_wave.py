"""Tests for the qb00-qb03 wave: ITS slope change, Hill tail index,
Heaps-law fit, peak concurrency."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F

from ontology_mapper_spark.operators.stats import hill_tail_index
from ontology_mapper_spark.operators.temporal import (
    its_slope_change,
    peak_concurrency_daily,
)
from ontology_mapper_spark.operators.textstats import heaps_law_fit

MICRO = 1_000_000


# ----------------------------------------------------------------------- its


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, v long")


def test_its_detects_slope_break(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # pre: flat 100/day for 10 days; post: +50/day ramp for 10 days
    for d in range(10):
        rows += [(t0 + dt.timedelta(days=d, seconds=i), 1) for i in range(100)]
    for d in range(10, 20):
        n = 100 + 50 * (d - 10)
        rows += [(t0 + dt.timedelta(days=d, seconds=i), 1) for i in range(n)]
    out = its_slope_change(_events(spark, rows), "ts", F.col("v")).collect()[0]
    assert out.n_days_pre == 10 and out.n_days_post == 10
    assert out.slope_pre_micro == 0
    assert out.slope_post_micro == 50 * MICRO
    assert out.delta_slope_micro == 50 * MICRO
    assert out.intercept_pre_micro == 100 * MICRO
    assert out.intercept_post_micro == 100 * MICRO
    # pre extrapolates flat 100 at the boundary; post starts at 100
    assert out.level_jump_micro == 0


def test_its_level_jump_without_slope_change(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(6):
        rows += [(t0 + dt.timedelta(days=d, seconds=i), 1) for i in range(50)]
    for d in range(6, 12):
        rows += [(t0 + dt.timedelta(days=d, seconds=i), 1) for i in range(80)]
    out = its_slope_change(_events(spark, rows), "ts", F.col("v")).collect()[0]
    assert out.slope_pre_micro == 0 and out.slope_post_micro == 0
    assert out.level_jump_micro == 30 * MICRO


def test_its_single_day_half_is_null(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(seconds=i), 1) for i in range(10)]
    rows += [(t0 + dt.timedelta(days=5, seconds=i), 1) for i in range(10)]
    out = its_slope_change(_events(spark, rows), "ts", F.col("v")).collect()[0]
    assert out.slope_pre_micro is None and out.delta_slope_micro is None


# ---------------------------------------------------------------------- hill


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, id long")


def test_hill_exact_pareto_tail(spark):
    # x_i = round(C / i^(1/alpha)) gives H ~= 1/alpha; use an exact
    # geometric ladder instead: x_r = 2^(k-r) -> ln(x_r/x_k) = (k-r)ln2
    k = 10
    rows = [("g", 2 ** (k - r), r) for r in range(1, k + 1)]
    out = hill_tail_index(_vals(spark, rows), "g", "x", "id", k=k).collect()[0]
    assert out.n_tail == k - 1 and out.x_k == 1
    expected_terms = [round(MICRO * math.log(2 ** (k - r))) for r in range(1, k)]
    assert out.hill_h_micro == round(sum(expected_terms) / (k - 1))
    assert out.alpha_micro == round(MICRO * MICRO / out.hill_h_micro)


def test_hill_groups_below_k_drop(spark):
    rows = [("small", 10 + i, i) for i in range(5)]
    rows += [("big", 100 + i, i) for i in range(20)]
    out = hill_tail_index(_vals(spark, rows), "g", "x", "id", k=10).collect()
    assert [r.g for r in out] == ["big"]


def test_hill_heavier_tail_has_smaller_alpha(spark):
    heavy = [("h", 10 ** (6 - r // 2), r) for r in range(1, 13)]
    light = [("l", 1000 - 10 * r, r) for r in range(1, 13)]
    out = {
        r.g: r
        for r in hill_tail_index(
            _vals(spark, heavy + light), "g", "x", "id", k=12
        ).collect()
    }
    assert out["h"].alpha_micro < out["l"].alpha_micro


# --------------------------------------------------------------------- heaps


def test_heaps_sublinear_vocabulary_beta_below_one(spark):
    # 10 days; tokens repeat heavily: day d contributes 100 tokens but
    # only ~10 new types -> beta well below 1
    rows = []
    for d in range(10):
        words = " ".join(
            [f"w{d}_{i}" for i in range(10)] + ["the"] * 90
        )
        rows.append((words, dt.date(2024, 1, 1) + dt.timedelta(days=d)))
    df = spark.createDataFrame(rows, "text string, ts date")
    out = heaps_law_fit(df, "text", "ts").collect()[0]
    assert out.n_days == 10
    assert out.n_tokens == 1000 and out.n_vocab == 101
    assert 0 < out.beta_micro < MICRO


def test_heaps_all_new_vocabulary_beta_near_one(spark):
    rows = []
    for d in range(8):
        words = " ".join(f"u{d}_{i}" for i in range(50))
        rows.append((words, dt.date(2024, 1, 1) + dt.timedelta(days=d)))
    df = spark.createDataFrame(rows, "text string, ts date")
    out = heaps_law_fit(df, "text", "ts").collect()[0]
    assert out.n_vocab == out.n_tokens == 400
    assert abs(out.beta_micro - MICRO) < 2_000  # ln-ln line is exact-ish


def test_heaps_single_day_is_null(spark):
    df = spark.createDataFrame(
        [("a b c", dt.date(2024, 1, 1))], "text string, ts date"
    )
    out = heaps_law_fit(df, "text", "ts").collect()[0]
    assert out.beta_micro is None and out.intercept_milli is None


# --------------------------------------------------------- peak concurrency


def _sess_events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_peak_concurrency_counts_overlaps(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    # three users with overlapping sessions: u1 10:00-11:00,
    # u2 10:30-11:30, u3 12:00-12:10 (only 2 concurrent at 10:30)
    for m in (0, 30, 60):
        rows.append((1, t0 + dt.timedelta(minutes=m)))
    for m in (30, 60, 90):
        rows.append((2, t0 + dt.timedelta(minutes=m)))
    for m in (120, 130):
        rows.append((3, t0 + dt.timedelta(minutes=m)))
    out = peak_concurrency_daily(_sess_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.day == "2024-01-01"
    assert r.n_sessions == 3
    assert r.peak_concurrent == 2
    # peak first attained when u2's session opens at 10:30
    assert r.peak_at_us == int(
        (t0 + dt.timedelta(minutes=30)).replace(tzinfo=dt.timezone.utc).timestamp()
    ) * MICRO


def test_peak_concurrency_gap_splits_sessions(spark):
    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    # one user, two sessions separated by > 30min: never concurrent
    rows = [(1, t0), (1, t0 + dt.timedelta(minutes=10))]
    rows += [(1, t0 + dt.timedelta(minutes=50))]
    r = peak_concurrency_daily(_sess_events(spark, rows)).collect()[0]
    assert r.n_sessions == 2 and r.peak_concurrent == 1


def test_peak_concurrency_midnight_span_counts_both_days(spark):
    t0 = dt.datetime(2024, 1, 1, 23, 50, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(minutes=20))]
    out = {r.day: r for r in peak_concurrency_daily(_sess_events(spark, rows)).collect()}
    assert set(out) == {"2024-01-01", "2024-01-02"}
    assert all(r.peak_concurrent == 1 for r in out.values())


# ------------------------------------------------------- lift / stationary


def test_decile_lift_perfect_ranker(spark):
    from ontology_mapper_spark.operators.evaluate import decile_lift

    rows = [(i, 100 - i, 1 if i < 10 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, s long, y long")
    out = {r.tile: r for r in decile_lift(df, "s", F.col("y") == 1, "id", 10).collect()}
    # all positives have the highest scores -> tile 1 captures everything
    assert out[1].n_pos == 10 and out[1].capture_micro == MICRO
    assert out[1].lift_micro == 10 * MICRO
    assert out[10].capture_micro == MICRO and out[10].lift_micro == MICRO
    assert sum(r.n for r in out.values()) == 100


def test_decile_lift_uniform_labels_lift_one(spark):
    from ontology_mapper_spark.operators.evaluate import decile_lift

    rows = [(i, i % 37, i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s long, y long")
    out = decile_lift(df, "s", F.col("y") == 1, "id", 10).collect()
    # random labels: every cumulative lift within ~25% of 1.0
    for r in out:
        assert 700_000 < r.lift_micro < 1_350_000


def test_markov_stationary_two_state_chain(spark):
    from ontology_mapper_spark.operators.dialogue import markov_stationary

    # a->b always, b->a always: stationary = 50/50; build 1 user sequence
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append((1, "a" if i % 2 == 0 else "b", t0 + dt.timedelta(minutes=i), i))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {r.state: r for r in markov_stationary(df).collect()}
    assert set(out) == {"a", "b"}
    assert abs(out["a"].stationary_micro - 500_000) <= 2
    assert abs(out["b"].stationary_micro - 500_000) <= 2


def test_markov_stationary_sink_state_accumulates(spark):
    from ontology_mapper_spark.operators.dialogue import markov_stationary

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # many users: a -> b -> b -> b ... (b is near-absorbing, a never re-entered)
    for u in range(10):
        seq = ["a"] + ["b"] * 6
        for i, st in enumerate(seq):
            rows.append((u, st, t0 + dt.timedelta(minutes=i), i))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = {r.state: r for r in markov_stationary(df).collect()}
    assert out["b"].stationary_micro > 900_000
    assert out["b"].rank == 1


# ----------------------------------------------------- mixing / ql retrieval


def test_mixture_allocation_greedy_fill(spark):
    from ontology_mapper_spark.operators.mixing import mixture_allocation

    rows = [("hi", 100, 900_000), ("mid", 100, 500_000), ("lo", 100, 100_000)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, quality_micro long")
    # budget = 300 * 2 // 5 = 120: hi fully, mid 20, lo 0
    out = {r.source: r for r in mixture_allocation(df).collect()}
    assert out["hi"].alloc_tokens == 100 and out["hi"].fill_rank == 1
    assert out["mid"].alloc_tokens == 20
    assert out["lo"].alloc_tokens == 0
    assert out["hi"].alloc_share_micro == round(100 * 1_000_000 / 120)


def test_mixture_allocation_budget_exhausts_exactly(spark):
    from ontology_mapper_spark.operators.mixing import mixture_allocation

    rows = [(f"s{i}", 50, 1_000_000 - i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, quality_micro long")
    out = mixture_allocation(df).collect()
    assert sum(r.alloc_tokens for r in out) == 500 * 2 // 5


def test_ql_dirichlet_prefers_term_rich_docs(spark):
    from ontology_mapper_spark.operators.retrieval import ql_dirichlet_topk

    rows = [
        (1, "apple apple apple banana"),
        (2, "apple banana cherry durian"),
        (3, "cherry durian elderberry fig"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ql_dirichlet_topk(df, ["apple"], "text", "doc_id", mu=10, top_k=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert out[0].rank == 1 and out[0].score_micro > out[1].score_micro


def test_ql_dirichlet_absent_terms_drop_and_all_docs_score(spark):
    from ontology_mapper_spark.operators.retrieval import ql_dirichlet_topk

    rows = [(1, "aa bb"), (2, "aa bb cc dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ql_dirichlet_topk(df, ["aa", "zzz_missing"], "text", "doc_id", mu=4, top_k=5).collect()
    assert len(out) == 2  # missing term contributes nothing, docs still rank
    # shorter doc has higher p(aa|d): tf/len advantage under smoothing
    assert out[0].doc_id == 1


# ------------------------------------------------------ jackknife / skyline


def test_jackknife_constant_ratio_has_zero_se(spark):
    from ontology_mapper_spark.operators.stats import jackknife_ratio

    # every day contributes num=20, den=10 -> ratio constant at 2.0
    rows = [(f"d{d}", 20, 10) for d in range(8)]
    df = spark.createDataFrame(rows, "day string, num long, den long")
    out = jackknife_ratio(df, "day", "num", "den").collect()[0]
    assert out.n_blocks == 8
    assert out.ratio_micro == 2_000_000
    assert out.jk_mean_micro == 2_000_000
    assert out.jk_se_micro == 0


def test_jackknife_varying_blocks_have_positive_se(spark):
    from ontology_mapper_spark.operators.stats import jackknife_ratio

    rows = [("d1", 10, 10), ("d2", 40, 10), ("d3", 10, 20), ("d4", 5, 10)]
    df = spark.createDataFrame(rows, "day string, num long, den long")
    out = jackknife_ratio(df, "day", "num", "den").collect()[0]
    assert out.jk_se_micro > 0
    assert out.ratio_micro == round(65 * 1_000_000 / 50)


def test_jackknife_single_block_is_null(spark):
    from ontology_mapper_spark.operators.stats import jackknife_ratio

    df = spark.createDataFrame([("d1", 3, 4)], "day string, num long, den long")
    out = jackknife_ratio(df, "day", "num", "den").collect()[0]
    # removing the only block empties the denominator: no usable blocks
    assert out.n_blocks == 0 or out.jk_se_micro is None


def test_pareto_sources_frontier(spark):
    from ontology_mapper_spark.operators.mixing import pareto_sources

    rows = [
        ("best", 100, 100),     # dominates mid + worst
        ("mid", 50, 50),
        ("worst", 10, 10),
        ("tradeoff", 200, 5),   # frontier: best tokens, bad quality
    ]
    df = spark.createDataFrame(rows, "source string, n_tokens long, quality_micro long")
    out = {r.source: r for r in pareto_sources(df).collect()}
    assert out["best"].is_pareto and out["tradeoff"].is_pareto
    assert not out["mid"].is_pareto and out["mid"].n_dominators == 1
    assert out["worst"].n_dominators == 2  # dominated by best AND mid


def test_pareto_ties_are_not_domination(spark):
    from ontology_mapper_spark.operators.mixing import pareto_sources

    rows = [("a", 10, 10), ("b", 10, 10)]
    df = spark.createDataFrame(rows, "source string, n_tokens long, quality_micro long")
    out = pareto_sources(df).collect()
    assert all(r.is_pareto for r in out)  # equal on all metrics: no > anywhere


# --------------------------------------------------------- did / recapture


def test_diff_in_diff_recovers_planted_effect(spark):
    from ontology_mapper_spark.operators.temporal import diff_in_diff

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # control: 10 pre, 12 post (time shock +2); treated: 10 pre, 17 post
    # (shock +2 plus effect +5)
    for d in range(4):
        post = d >= 2
        for i in range(50):
            rows.append((0, t0 + dt.timedelta(days=d, seconds=i), 12 if post else 10))
            rows.append((1, t0 + dt.timedelta(days=d, seconds=i), 17 if post else 10))
    df = spark.createDataFrame(rows, "grp long, ts timestamp, v long")
    out = diff_in_diff(df, "grp", F.col("grp") == 1, "ts", F.col("v")).collect()[0]
    assert out.mean_c_pre_micro == 10_000_000
    assert out.mean_c_post_micro == 12_000_000
    assert out.did_micro == 5_000_000


def test_diff_in_diff_empty_cell_is_null(spark):
    from ontology_mapper_spark.operators.temporal import diff_in_diff

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # control only in pre: c_post empty
    rows = [(0, t0, 5), (1, t0, 5), (1, t0 + dt.timedelta(days=2), 9)]
    df = spark.createDataFrame(rows, "grp long, ts timestamp, v long")
    out = diff_in_diff(df, "grp", F.col("grp") == 1, "ts", F.col("v")).collect()[0]
    assert out.did_micro is None and out.n_control_post == 0


def test_capture_recapture_full_overlap_is_exact(spark):
    from ontology_mapper_spark.operators.sketch import capture_recapture

    rows = [(f"v{i}", True, True) for i in range(50)]
    df = spark.createDataFrame(rows, "v string, in_a boolean, in_b boolean")
    out = capture_recapture(df, "v", "in_a", "in_b").collect()[0]
    assert out.n_a == out.n_b == out.n_both == 50
    # (51*51/51)-1 = 50: full overlap recovers the true population
    assert out.chapman_est == 50
    assert out.jaccard_micro == 1_000_000


def test_capture_recapture_half_overlap_estimates_population(spark):
    from ontology_mapper_spark.operators.sketch import capture_recapture

    # true population 100; A sees first 60, B sees last 60, overlap 20
    rows = [(f"v{i}", i < 60, i >= 40) for i in range(100)]
    df = spark.createDataFrame(rows, "v string, in_a boolean, in_b boolean")
    out = capture_recapture(df, "v", "in_a", "in_b").collect()[0]
    assert out.n_a == 60 and out.n_b == 60 and out.n_both == 20
    assert out.chapman_est == round(61 * 61 / 21) - 1  # ~176, biased up here


# ----------------------------------------------------- entropy rate / ztest


def test_markov_entropy_rate_deterministic_chain_is_zero(spark):
    from ontology_mapper_spark.operators.dialogue import markov_entropy_rate

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, "a" if i % 2 == 0 else "b", t0 + dt.timedelta(minutes=i), i)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = markov_entropy_rate(df).collect()
    # a->b and b->a with probability 1: zero entropy everywhere
    assert all(r.h_state_micro == 0 for r in out)
    assert all(r.entropy_rate_micro == 0 for r in out)


def test_markov_entropy_rate_uniform_chain_is_ln_k(spark):
    from ontology_mapper_spark.operators.dialogue import markov_entropy_rate

    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    # cycle through 4 states from each state equally: build with many
    # users so each (from, to) pair over {a,b} x {a,b} appears equally
    states = ["a", "b"]
    rows = []
    u = 0
    for s0 in states:
        for s1 in states:
            for rep in range(5):
                rows.append((u, s0, t0, 0))
                rows.append((u, s1, t0 + dt.timedelta(minutes=1), 1))
                u += 1
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    out = markov_entropy_rate(df).collect()
    expected = round(1_000_000 * math.log(2))
    for r in out:
        assert abs(r.h_state_micro - expected) <= 2
        assert abs(r.entropy_rate_micro - expected) <= 2


def test_two_proportion_ztest_detects_difference(spark):
    from ontology_mapper_spark.operators.stats import two_proportion_ztest

    rows = [("a", 1 if i < 300 else 0) for i in range(1000)]
    rows += [("b", 1 if i < 100 else 0) for i in range(1000)]
    df = spark.createDataFrame(rows, "seg string, hit long")
    out = two_proportion_ztest(df, "seg", "a", "b", "hit").collect()[0]
    assert out.p_a_micro == 300_000 and out.p_b_micro == 100_000
    assert out.z_micro > 1_959_964 and out.significant


def test_two_proportion_ztest_null_and_degenerate(spark):
    from ontology_mapper_spark.operators.stats import two_proportion_ztest

    same = [("a", i % 5 == 0) for i in range(200)] + [
        ("b", i % 5 == 0) for i in range(200)
    ]
    df = spark.createDataFrame(same, "seg string, hit boolean")
    out = two_proportion_ztest(df, "seg", "a", "b", "hit").collect()[0]
    assert out.z_micro == 0 and not out.significant
    allz = spark.createDataFrame(
        [("a", 0), ("b", 0)], "seg string, hit long"
    )
    out2 = two_proportion_ztest(allz, "seg", "a", "b", "hit").collect()[0]
    assert out2.z_micro is None and out2.significant is None
