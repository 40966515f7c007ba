"""Unit tests for the transcript-analytics/cluster-eval wave (qa72–qa75
operators): context truncation, centroid silhouette, shuffle balance,
response latency."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.clustering import centroid_silhouette
from ontology_mapper_spark.operators.dialogue import (
    context_truncation_audit,
    response_latency,
)
from ontology_mapper_spark.operators.skew import shuffle_balance_audit


def _ts(i):
    return datetime(2024, 1, 1) + timedelta(minutes=i)


def test_context_truncation_recency_first(spark):
    # conv a: 5 turns of 100 tokens, budget 250 → newest 2 kept.
    # conv b: 1 turn of 100 → kept, not truncated.
    rows = [("a", _ts(i), i, 100) for i in range(5)] + [("b", _ts(0), 0, 100)]
    df = spark.createDataFrame(rows, "c string, ts timestamp, i int, tok int")
    out = {
        r["len_bucket"]: r
        for r in context_truncation_audit(
            df, "c", ["ts", "i"], "tok", 250
        ).collect()
    }
    r0 = out[0]  # both convs have <10 turns → bucket 0
    assert r0["n_convs"] == 2 and r0["n_turns"] == 6
    assert r0["kept_turns"] == 3 and r0["dropped_turns"] == 3
    assert r0["convs_truncated"] == 1
    assert r0["drop_rate_micro"] == 500_000


def test_context_truncation_exact_budget_kept(spark):
    rows = [("a", _ts(0), 0, 250), ("a", _ts(1), 1, 250)]
    df = spark.createDataFrame(rows, "c string, ts timestamp, i int, tok int")
    out = context_truncation_audit(df, "c", ["ts", "i"], "tok", 500).collect()
    assert out[0]["dropped_turns"] == 0  # cumsum == budget survives


def test_centroid_silhouette_separated_blobs(spark):
    # two tight blobs far apart, k=2 → mean silhouette near 1.
    rows = [(i, [0.0 + i * 0.001, 0.0]) for i in range(6)] + [
        (100 + i, [10.0 + i * 0.001, 10.0]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = centroid_silhouette(df, "vec_id", "embedding", k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_members"] == 6
        assert r["mean_s_micro"] > 990_000


def test_shuffle_balance_hot_key(spark):
    # one key holds 900 of 1000 rows → its partition carries ≥90% load.
    rows = [(0,)] * 900 + [(i,) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k bigint")
    out = shuffle_balance_audit(df, "k", 8).collect()
    assert sum(r["n_rows"] for r in out) == 1000
    top = max(out, key=lambda r: r["n_rows"])
    assert top["n_rows"] >= 900
    assert top["balance_micro"] >= 900_000 * 8
    assert abs(sum(r["load_share_micro"] for r in out) - 1_000_000) < 100


def test_response_latency_percentiles(spark):
    # one conv alternating user/assistant with gaps 1..10 minutes for
    # the u→a transition (odd positions) — p50 = 5th smallest.
    rows = []
    t = datetime(2024, 1, 1)
    gaps_ua = [60, 120, 180, 240, 300, 360, 420, 480, 540, 600]
    for i, g in enumerate(gaps_ua):
        rows.append(("c", "user", t, i * 2))
        t = t + timedelta(seconds=g)
        rows.append(("c", "assistant", t, i * 2 + 1))
        t = t + timedelta(seconds=30)  # a→u gap constant
    df = spark.createDataFrame(rows, "c string, r string, ts timestamp, i int")
    out = {
        (r["prev_role"], r["role"]): r
        for r in response_latency(df, "c", "r", "ts", "i").collect()
    }
    ua = out[("user", "assistant")]
    assert ua["n"] == 10
    assert ua["p50_us"] == 300 * 1_000_000  # 5th of 10 sorted gaps
    assert ua["p90_us"] == 540 * 1_000_000  # ceil(0.9*10)=9th
    assert ua["max_us"] == 600 * 1_000_000
    assert ua["mean_us"] == round(sum(gaps_ua) / 10 * 1e6)
    au = out[("assistant", "user")]
    assert au["n"] == 9 and au["p50_us"] == 30 * 1_000_000
