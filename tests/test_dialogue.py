"""Dialogue-structure operators over the north-rule transcript shape."""

from __future__ import annotations

from datetime import datetime

from ontology_mapper_spark.datagen.transcripts import (
    transcripts_rows,
    transcripts_schema,
)
from ontology_mapper_spark.operators.dialogue import (
    dialogue_shape,
    role_transition_matrix,
)


def _ts(s):
    return datetime(2026, 1, 1, 0, 0, s)


def test_role_transitions_hand_computed(spark):
    rows = [
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "yo", None, _ts(10)),
        ("c1", 2, "user", "ok", None, _ts(20)),
        ("c1", 3, "assistant", "fin", None, _ts(30)),
        ("c2", 0, "user", "a", None, _ts(0)),
        ("c2", 1, "tool", "b", "search", _ts(5)),
    ]
    df = spark.createDataFrame(rows, transcripts_schema())
    out = {
        (r["prev_role"], r["role"]): r
        for r in role_transition_matrix(df).collect()
    }
    # user->assistant twice, assistant->user once, user->tool once
    assert out[("user", "assistant")]["n"] == 2
    assert out[("assistant", "user")]["n"] == 1
    assert out[("user", "tool")]["n"] == 1
    # user row-marginal = 3: p(assistant|user) = 2/3 -> 666667 micro
    assert out[("user", "assistant")]["p_micro"] == 666667
    assert out[("user", "tool")]["p_micro"] == 333333
    assert out[("assistant", "user")]["p_micro"] == 1000000


def test_dialogue_shape_hand_computed(spark):
    rows = [
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "yo", "browser", _ts(10)),
        ("c1", 2, "tool", "r", "search", _ts(25)),
        ("c2", 0, "user", "solo", None, _ts(7)),
    ]
    df = spark.createDataFrame(rows, transcripts_schema())
    out = {r["conv_id"]: r for r in dialogue_shape(df).collect()}
    c1 = out["c1"]
    assert c1["n_turns"] == 3 and c1["n_user"] == 1 and c1["n_assistant"] == 1
    assert c1["n_tool_role"] == 1 and c1["n_tool_calls"] == 2
    assert c1["duration_us"] == 25_000_000
    assert c1["mean_gap_us"] == 12_500_000
    c2 = out["c2"]
    assert c2["n_turns"] == 1 and c2["duration_us"] == 0
    assert c2["mean_gap_us"] is None  # single turn: gap undefined


def test_transition_marginals_on_generated_corpus(spark):
    """On the real generator: transition counts must total n_turns−1 per
    conv summed over the corpus, and each prev_role's p_micro ≈ 1e6."""
    df = spark.createDataFrame(transcripts_rows(n_convs=40), transcripts_schema())
    n_turns = df.count()
    n_convs = df.select("conv_id").distinct().count()
    mat = role_transition_matrix(df).collect()
    assert sum(r["n"] for r in mat) == n_turns - n_convs
    by_prev: dict[str, int] = {}
    for r in mat:
        by_prev[r["prev_role"]] = by_prev.get(r["prev_role"], 0) + r["p_micro"]
    for total in by_prev.values():
        assert abs(total - 1_000_000) <= 2  # rounding slack


def test_context_assembly_budget_prefix(spark):
    from ontology_mapper_spark.operators.chunking import (
        assemble_conversation_examples,
    )

    rows = [
        # c1: 3+4+5 tokens; budget 8 keeps exactly the first two turns
        ("c1", 0, "user", "a b c", None, _ts(0)),
        ("c1", 1, "assistant", "d e f g", None, _ts(1)),
        ("c1", 2, "user", "h i j k l", None, _ts(2)),
        # c2: first turn alone exceeds the budget -> conv dropped
        ("c2", 0, "user", "w x y z p q r s t", None, _ts(0)),
    ]
    df = spark.createDataFrame(rows, transcripts_schema())
    out = {
        r["conv_id"]: r
        for r in assemble_conversation_examples(df, token_budget=8).collect()
    }
    assert set(out) == {"c1"}
    assert out["c1"]["example"] == "user: a b c\nassistant: d e f g"
    assert out["c1"]["n_turns_used"] == 2
    assert out["c1"]["n_tokens_used"] == 7


def test_turn_echo_hand_computed(spark):
    from ontology_mapper_spark.operators.dialogue import turn_echo

    rows = [
        ("c1", 0, "user", "alpha beta gamma", None, _ts(0)),
        ("c1", 1, "assistant", "alpha beta delta epsilon", None, _ts(1)),
        ("c1", 2, "user", "zeta", None, _ts(2)),
        ("c2", 0, "user", "solo", None, _ts(0)),
    ]
    df = spark.createDataFrame(rows, transcripts_schema())
    out = {(r["conv_id"], r["turn_idx"]): r for r in turn_echo(df).collect()}
    # first turns and single-turn convs excluded
    assert set(out) == {("c1", 1), ("c1", 2)}
    assert out[("c1", 1)]["n_echoed"] == 2  # alpha, beta
    assert out[("c1", 1)]["echo_micro"] == 500000
    assert out[("c1", 2)]["n_echoed"] == 0 and out[("c1", 2)]["echo_micro"] == 0
