"""Unit tests for qa76/qa77 operators: Dunning G² edge significance and
per-group MMR re-ranking — closed-form cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.retrieval import mmr_rerank
from ontology_mapper_spark.pipeline.comention import llr_comention_edges


def _xlx_micro(x: int) -> int:
    return 0 if x == 0 else x * round(math.log(x) * 1e6)


def test_llr_matches_closed_form(spark):
    # 10 units: A∩B in 3, A-only in 2, B-only in 1, neither in 4.
    rows = []
    for u in range(3):
        rows += [(f"u{u}", "A"), (f"u{u}", "B")]
    for u in range(3, 5):
        rows.append((f"u{u}", "A"))
    rows.append(("u5", "B"))
    for u in range(6, 10):
        rows.append((f"u{u}", "C"))  # filler entity so N counts 10 units
    df = spark.createDataFrame(rows, "conv_id string, class_iri string")
    out = {
        (r["entity_a"], r["entity_b"]): r
        for r in llr_comention_edges(df).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_a"] == 5 and ab["n_b"] == 4 and ab["n_ab"] == 3
    assert ab["n_units"] == 10
    k11, k12, k21, k22, n = 3, 2, 1, 4, 10
    want = 2 * (
        _xlx_micro(k11) + _xlx_micro(k12) + _xlx_micro(k21) + _xlx_micro(k22)
        - _xlx_micro(5) - _xlx_micro(5) - _xlx_micro(4) - _xlx_micro(6)
        + _xlx_micro(n)
    )
    assert ab["g2_micro"] == want
    # enriched pair → positive G² with this margin structure
    assert ab["g2_micro"] > 0


def test_llr_independent_pair_near_zero(spark):
    # A in every unit, B in every unit → k12=k21=k22=0: G² degenerates
    # to exactly 0 (all mass on k11; xlx cancellation).
    rows = []
    for u in range(8):
        rows += [(f"u{u}", "A"), (f"u{u}", "B")]
    df = spark.createDataFrame(rows, "conv_id string, class_iri string")
    out = llr_comention_edges(df).collect()
    assert len(out) == 1
    assert out[0]["g2_micro"] == 0


def test_mmr_penalizes_duplicates(spark):
    # query = md5-min member; candidate 2 duplicates candidate 1: after
    # picking the best, its duplicate must fall behind the orthogonal
    # vector despite equal relevance.
    rows = [
        ("a", 1, [1.0, 0.0]),
        ("a", 2, [1.0, 0.0]),
        ("a", 3, [0.9, 0.1]),
        ("a", 4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "g string, vec_id bigint, embedding array<float>"
    )
    out = {r["pick_rank"]: r for r in mmr_rerank(df, "g", k=3).collect()}
    ids = [out[r]["vec_id"] for r in (1, 2, 3)]
    assert len(set(ids)) == 3  # picks never repeat
    # the duplicate pair (1,2) must NOT occupy ranks 1+2 together
    assert set(ids[:2]) != {1, 2}


def test_mmr_all_groups_get_k_picks(spark):
    rows = [
        (g, i + 10 * gi, [float(i == j) for j in range(4)])
        for gi, g in enumerate(["x", "y"])
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "g string, vec_id bigint, embedding array<float>"
    )
    out = mmr_rerank(df, "g", k=3).collect()
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r["pick_rank"])
    assert sorted(per_g) == ["x", "y"]
    assert all(sorted(v) == [1, 2, 3] for v in per_g.values())


def test_dispersion_poisson_vs_bursty(spark):
    from datetime import datetime, timedelta

    from ontology_mapper_spark.operators.temporal import dispersion_daily

    base = datetime(2024, 1, 1)
    rows = []
    # 'flat': constant 5/day → var 0 → VMR 0, not overdispersed
    for i in range(10):
        rows += [("flat", base + timedelta(days=i))] * 5
    # 'bursty': alternates 1 and 19 → mean 10, var 85.26..→ VMR >> 2
    for i in range(10):
        rows += [("bursty", base + timedelta(days=i))] * (1 if i % 2 else 19)
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r for r in dispersion_daily(df, "event_type").collect()}
    assert out["flat"]["vmr_micro"] == 0
    assert out["flat"]["overdispersed"] is False
    assert out["bursty"]["mean_micro"] == 10_000_000
    assert out["bursty"]["overdispersed"] is True
    var = (5 * 19 * 19 + 5 * 1 * 1 - 100 * 100 / 10) / 9
    assert out["bursty"]["vmr_micro"] == round(var / 10 * 1e6)


def test_weighted_median_length_biased(spark):
    from ontology_mapper_spark.operators.stats import weighted_median

    # values 1..4 with weight=value: total w=10, half=5 → cumw hits 5
    # at value 3 (1+2+3=6 ≥ 5) → weighted median 3; plain median rn*2>=n
    # → rn=2 of 4 → value 2.
    df = spark.createDataFrame(
        [("g", v, v, v) for v in (1, 2, 3, 4)],
        "g string, v bigint, w bigint, tb bigint",
    )
    out = weighted_median(df, "g", "v", "w", "tb").collect()[0]
    assert out["w_total"] == 10
    assert out["p50_weighted"] == 3
    assert out["p50_plain"] == 2


def test_cluster_agreement_perfect_and_split(spark):
    from ontology_mapper_spark.operators.clustering import cluster_agreement

    # perfect agreement → B3 P=R=F1=1, ARI=1
    rows = [(i, i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, c int, g int")
    out = cluster_agreement(df, "id", "c", "g").collect()[0]
    assert out["b3_p_micro"] == 1_000_000
    assert out["b3_r_micro"] == 1_000_000
    assert out["ari_micro"] == 1_000_000
    # over-split clustering (every item its own cluster): P=1, R<1, ARI=0
    rows2 = [(i, i, i % 3) for i in range(30)]
    df2 = spark.createDataFrame(rows2, "id bigint, c int, g int")
    out2 = cluster_agreement(df2, "id", "c", "g").collect()[0]
    assert out2["b3_p_micro"] == 1_000_000
    assert out2["b3_r_micro"] == 100_000  # each item covers 1/10 of its gold class
    assert out2["ari_micro"] == 0


def test_decay_trend_exact_exponential(spark):
    from datetime import datetime, timedelta

    from ontology_mapper_spark.operators.temporal import decay_trend

    base = datetime(2024, 1, 1)
    rows = []
    counts = [512, 256, 128, 64, 32, 16, 8]  # halves daily → halflife 1d
    for i, n in enumerate(counts):
        rows += [("t", base + timedelta(days=i))] * n
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = decay_trend(df, "event_type").collect()[0]
    assert out["n_days"] == 7
    # slope = -ln2 per day in micro-nats
    assert abs(out["slope_micro"] + 693_147) <= 2
    assert abs(out["halflife_days_micro"] - 1_000_000) <= 10
    assert abs(out["intercept_micro"] - round(math.log(512) * 1e6)) <= 2


def test_calibration_perfectly_calibrated_bin(spark):
    from ontology_mapper_spark.operators.evaluate import calibration_report

    # scores 0..99, label true iff score >= 50: bins 0-4 acc 0, 5-9 acc 1
    rows = [(s, s >= 50) for s in range(100)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    out = {r["bin"]: r for r in calibration_report(df, "s", "y", 10).collect()}
    assert len(out) == 10 and all(out[b]["n"] == 10 for b in out)
    assert out[0]["acc_micro"] == 0 and out[0]["conf_micro"] == 50_000
    assert out[9]["acc_micro"] == 1_000_000 and out[9]["conf_micro"] == 950_000
    # ECE = mean of |acc-conf| with equal bins
    want = round(sum(out[b]["gap_micro"] * 10 for b in out) / 100)
    assert out[3]["ece_micro"] == want


def test_profile_drift_null_and_vocab_collapse(spark):
    from ontology_mapper_spark.operators.stats import profile_drift

    # side 1 nulls half its lang values and collapses source vocab to 1
    rows = []
    for i in range(40):
        side = i % 2
        lang = None if (side == 1 and i % 4 == 1) else f"l{i % 4}"
        src = "only" if side == 1 else f"s{i % 5}"
        rows.append((i, lang, src))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string")
    out = {
        r["col"]: r
        for r in profile_drift(
            df, (F.col("doc_id") % 2), ["lang", "source"]
        ).collect()
    }
    assert out["lang"]["null0_micro"] == 0
    assert out["lang"]["null1_micro"] == 500_000
    assert out["source"]["distinct_0"] == 5
    assert out["source"]["distinct_1"] == 1
    assert out["source"]["distinct_ratio_micro"] == 200_000


def test_behavior_fingerprints_groups_identical_sequences(spark):
    from datetime import datetime, timedelta

    from ontology_mapper_spark.operators.dialogue import behavior_fingerprints

    t0 = datetime(2024, 1, 1)
    rows = []
    # users a and b: identical view->click->buy; c: different order
    for u in ("a", "b"):
        for i, act in enumerate(["view", "click", "buy"]):
            rows.append((u, act, t0 + timedelta(minutes=i), i))
    for i, act in enumerate(["click", "view", "buy"]):
        rows.append(("c", act, t0 + timedelta(minutes=i), i))
    df = spark.createDataFrame(rows, "u string, act string, ts timestamp, i int")
    out = behavior_fingerprints(df, "u", "act", ["ts", "i"], 2).collect()
    assert len(out) == 1
    assert out[0]["n_actors"] == 2
    assert out[0]["actor_min"] == "a" and out[0]["actor_max"] == "b"
    assert out[0]["n_actions"] == 3


def test_novelty_curve_day1_all_new_then_decay(spark):
    from datetime import datetime

    from ontology_mapper_spark.operators.textstats import novelty_curve

    rows = [
        ("alpha beta gamma", datetime(2024, 1, 1)),
        ("alpha beta delta", datetime(2024, 1, 2)),  # 1 of 2 bigrams new
        ("alpha beta gamma", datetime(2024, 1, 3)),  # nothing new
    ]
    df = spark.createDataFrame(rows, "text string, ts timestamp")
    out = {r["day"]: r for r in novelty_curve(df, "text", "ts").collect()}
    d1 = out["2024-01-01"]
    assert d1["n_shingles"] == 2 and d1["novelty_micro"] == 1_000_000
    d2 = out["2024-01-02"]
    assert d2["n_new"] == 1 and d2["novelty_micro"] == 500_000
    d3 = out["2024-01-03"]
    assert d3["n_new"] == 0 and d3["cum_new"] == 3


def test_multiclass_report_known_confusion(spark):
    from ontology_mapper_spark.operators.evaluate import multiclass_report

    # actual: 6a 4b; predicted: a right 5, one a->b; b right 2, two b->c
    rows = (
        [("a", "a")] * 5 + [("a", "b")]
        + [("b", "b")] * 2 + [("b", "c")] * 2
    )
    df = spark.createDataFrame(rows, "y string, p string")
    out = {r["label"]: r for r in multiclass_report(df, "y", "p").collect()}
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert a["tp"] == 5 and a["n_actual"] == 6 and a["n_pred"] == 5
    assert a["p_micro"] == 1_000_000
    assert a["r_micro"] == round(5e6 / 6)
    assert a["f1_micro"] == round(10e6 / 11)
    c = out["c"]  # predicted-only class
    assert c["n_actual"] == 0 and c["r_micro"] is None and c["f1_micro"] == 0
    assert a["accuracy_micro"] == 700_000
    want_macro = round(
        (round(10e6 / 11) + round(4e6 / 7) + 0) / 3
    )
    assert a["macro_f1_micro"] == want_macro


def test_cuped_perfectly_correlated_pre_post(spark):
    from datetime import datetime, timedelta

    from ontology_mapper_spark.operators.evaluate import cuped_adjustment

    t0 = datetime(2024, 1, 1)
    rows = []
    # user u: pre activity k, post activity 2k → corr = 1, theta = 2
    for u, k in enumerate((1, 2, 3, 4, 5)):
        for _ in range(1):
            rows.append((u, float(k), t0))
            rows.append((u, float(2 * k), t0 + timedelta(days=10)))
    df = spark.createDataFrame(rows, "user_id bigint, value double, ts timestamp")
    out = cuped_adjustment(df, "user_id", "value").collect()[0]
    assert out["n_units"] == 5
    assert out["theta_micro"] == 2_000_000
    assert out["corr_micro"] == 1_000_000
    assert out["var_reduction_micro"] == 1_000_000


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from ontology_mapper_spark.operators.stats import bootstrap_mean_ci

    rows = [("g", 100 + (i * 37) % 50, i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v bigint, id bigint")
    a = bootstrap_mean_ci(df, "g", "v", "id", 40).collect()[0]
    b = bootstrap_mean_ci(df, "g", "v", "id", 40).collect()[0]
    assert a == b  # fully deterministic resampling
    assert a["boot_lo_micro"] <= a["mean_micro"] <= a["boot_hi_micro"]
    # CI width should be a few SEs, not zero and not the whole range
    assert 0 < a["boot_hi_micro"] - a["boot_lo_micro"] < 50_000_000
    assert a["se_micro"] > 0
