"""Aho-Corasick automaton + distributed mention detection tests."""

from __future__ import annotations

import random
import re

from ontology_mapper_spark.pipeline.mention_detect import (
    AhoCorasick,
    build_dictionary,
    detect_mentions,
)


def naive_find(text: str, patterns: list[str]):
    """Regex-based oracle: case-insensitive word-boundary matches."""
    t = text.lower()
    out = set()
    for p in patterns:
        pl = p.lower().strip()
        if not pl:
            continue
        for m in re.finditer(re.escape(pl), t):
            b, e = m.start(), m.end()
            if b > 0 and t[b - 1].isalnum():
                continue
            if e < len(t) and t[e].isalnum():
                continue
            out.add((b, e, pl))
    return out


def test_ac_matches_naive_on_random_text():
    rng = random.Random(7)
    vocab = ["pain", "chronic pain", "ache", "headache", "pa", "in", "chronic",
             "long covid", "covid", "covid-19", "x y z"]
    for trial in range(50):
        pats = rng.sample(vocab, rng.randrange(2, len(vocab)))
        words = [rng.choice(vocab + ["filler", "words", "the"]) for _ in range(rng.randrange(1, 30))]
        text = " ".join(words)
        if rng.random() < 0.3:
            text = text.upper()
        ac = AhoCorasick()
        for p in pats:
            ac.add(p)
        ac.build()
        got = set(ac.find(text))
        assert got == naive_find(text, pats), (pats, text)


def test_ac_overlapping_and_substring_patterns():
    ac = AhoCorasick()
    for p in ["hash join", "join", "ash"]:
        ac.add(p)
    ac.build()
    # 'ash' inside 'hash' violates the word boundary; both joins match
    got = set(ac.find("hash join"))
    assert got == {(0, 9, "hash join"), (5, 9, "join")}


def test_ac_boundary_rejects_alnum_neighbors():
    ac = AhoCorasick()
    ac.add("pain")
    ac.build()
    assert list(ac.find("painful spain pain!")) == [(14, 18, "pain")]


def test_detect_mentions_distributed(spark):
    rows = [
        ("c1", 0, "severe PAIN reported"),
        ("c1", 1, "no issues"),
        ("c2", 0, "chronic pain and pain"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = detect_mentions(spark, df, ["pain", "chronic pain"]).collect()
    got = {(r.conv_id, r.turn_idx, r.begin, r.end, r.surface, r.pattern) for r in out}
    assert ("c1", 0, 7, 11, "PAIN", "pain") in got
    assert ("c2", 0, 0, 12, "chronic pain", "chronic pain") in got
    # 'pain' inside 'chronic pain' matches too (boundaries are word-level)
    assert ("c2", 0, 8, 12, "pain", "pain") in got
    assert ("c2", 0, 17, 21, "pain", "pain") in got
    assert all(r.conv_id != "c1" or r.turn_idx != 1 for r in out)


def test_build_dictionary_filters_and_normalizes(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("label", T.StringType()),
            T.StructField("synonyms", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(
        [("  Pain ", ["ACHE", "x", "", "  ", "ache", "sore spot"])], schema
    )
    pats = build_dictionary(df)
    # label lowered+trimmed; synonyms <3 chars dropped; dupes collapsed
    assert pats == ["ache", "pain", "sore spot"]
