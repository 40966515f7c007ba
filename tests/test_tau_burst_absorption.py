"""Unit tests for the qb93-qb95 wave: Kendall tau-b, word
burstiness, absorbing-chain k-step probabilities."""

from __future__ import annotations

from datetime import datetime

from ontology_mapper_spark.operators.dialogue import absorption_within_k
from ontology_mapper_spark.operators.stats import (
    kendall_tau_b,
    word_burstiness,
)


def test_kendall_tau_perfect_orders(spark):
    inc = spark.createDataFrame(
        [(i, i) for i in range(10)], "x long, y long"
    )
    out = kendall_tau_b(inc, "x", "y").collect()[0]
    assert out["tau_b_milli"] == 1000
    assert out["discordant"] == 0
    dec = spark.createDataFrame(
        [(i, 9 - i) for i in range(10)], "x long, y long"
    )
    out2 = kendall_tau_b(dec, "x", "y").collect()[0]
    assert out2["tau_b_milli"] == -1000


def test_kendall_tau_ties_and_independence(spark):
    # constant y: denominator factor (n0 - ty) = 0 -> null
    flat = spark.createDataFrame(
        [(i, 5) for i in range(10)], "x long, y long"
    )
    out = kendall_tau_b(flat, "x", "y").collect()[0]
    assert out["tau_b_milli"] is None
    # balanced 2x2 grid: C = D -> tau 0
    bal = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 0), (1, 1)] * 5, "x long, y long"
    )
    out2 = kendall_tau_b(bal, "x", "y").collect()[0]
    assert out2["tau_b_milli"] == 0


def test_word_burstiness_separates_repeaters(spark):
    # "topic" always repeats within its docs; "the" appears once per doc
    rows = []
    for i in range(10):
        rows.append((i, "topic topic filler the"))
    for i in range(10, 20):
        rows.append((i, "the filler"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["word"]: r for r in word_burstiness(df, "text", 5).collect()}
    assert out["topic"]["p_repeat_micro"] == 1_000_000
    assert out["the"]["p_repeat_micro"] == 0
    assert out["topic"]["df1"] == 10 and out["topic"]["df2"] == 10
    assert out["the"]["df1"] == 20


def test_absorption_deterministic_path(spark):
    # chain per user: view -> click -> purchase (absorbing).
    # from click: absorbed in purchase at step 1 (p = 1e6)
    # from view: needs 2 steps -> after k=3 still 1e6 (minus div drift)
    rows = []
    eid = 0
    for u in range(5):
        for i, t in enumerate(["view", "click", "purchase"]):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1, 0, u * 10 + i), u, t))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["state"], r["absorbing_state"]): r["p_absorb_micro"]
        for r in absorption_within_k(
            df, "user_id", "event_type", ("ts", "event_id"),
            absorbing=("purchase", "error"), k=3,
        ).collect()
    }
    assert out[("click", "purchase")] == 1_000_000
    assert out[("view", "purchase")] == 1_000_000
    assert ("view", "error") not in out  # error never reached


def test_absorption_split_paths(spark):
    # from "view": half the users purchase, half error (1 step)
    rows = []
    eid = 0
    for u in range(10):
        final = "purchase" if u % 2 == 0 else "error"
        for i, t in enumerate(["view", final]):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1, 0, u * 5 + i), u, t))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["state"], r["absorbing_state"]): r["p_absorb_micro"]
        for r in absorption_within_k(
            df, "user_id", "event_type", ("ts", "event_id"),
            absorbing=("purchase", "error"), k=3,
        ).collect()
    }
    assert out[("view", "purchase")] == 500_000
    assert out[("view", "error")] == 500_000
