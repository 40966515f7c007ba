"""Tests for the round-3 session-3 operators: CDC apply_changes,
prefix-filtered exact set-similarity join, source containment, Z-order
layout stats, and boilerplate template detection — each vs a brute-force
Python oracle on small deterministic data."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapper_spark.operators.boilerplate import template_groups
from ontology_mapper_spark.operators.cdc import apply_changes
from ontology_mapper_spark.operators.layout import zorder_key, zorder_layout_stats
from ontology_mapper_spark.operators.setjoin import (
    prefix_jaccard_pairs,
    source_token_containment,
)

# ---------------------------------------------------------------- CDC


def test_apply_changes_latest_wins_and_deletes(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        ["k", "st", "v"],
    )
    changes = spark.createDataFrame(
        [
            (2, "b1", 21, 1, "U"),   # updated once
            (3, "c1", 31, 1, "U"),   # updated then deleted -> gone
            (3, "c1", 31, 2, "D"),
            (4, "d0", 0, 1, "D"),    # deleted then re-inserted -> insert wins
            (4, "d2", 42, 2, "I"),
            (5, "e", 50, 1, "I"),    # brand-new key
        ],
        ["k", "st", "v", "seq", "op"],
    )
    out = apply_changes(base, changes, key_cols=["k"], seq_col="seq")
    got = {r.k: (r.st, r.v) for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("b1", 21), 4: ("d2", 42), 5: ("e", 50)}


def test_apply_changes_randomized_vs_dict_replay(spark):
    rng = random.Random(7)
    base_rows = [(k, f"s{k}", k * 10) for k in range(20)]
    log = []
    for seq in range(1, 60):
        k = rng.randrange(30)
        op = rng.choice(["U", "U", "I", "D"])
        log.append((k, f"u{seq}", seq, seq, op))
    # dict replay oracle: base at seq -1, apply in seq order
    state = {k: (st, v) for k, st, v in base_rows}
    for k, st, v, _seq, op in log:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (st, v)
    base = spark.createDataFrame(base_rows, ["k", "st", "v"])
    changes = spark.createDataFrame(log, ["k", "st", "v", "seq", "op"])
    out = apply_changes(base, changes, key_cols=["k"], seq_col="seq")
    got = {r.k: (r.st, r.v) for r in out.collect()}
    assert got == state


# ----------------------------------------------------- prefix Jaccard


def _norm_tokens(text: str) -> frozenset[str]:
    return frozenset(" ".join(text.split()).lower().split())


def _brute_pairs(docs: dict[int, str], t: float) -> set[tuple[int, int]]:
    toks = {i: _norm_tokens(s) for i, s in docs.items()}
    out = set()
    for a, b in itertools.combinations(sorted(toks), 2):
        ta, tb = toks[a], toks[b]
        if not ta or not tb:
            continue
        inter = len(ta & tb)
        union = len(ta | tb)
        # integer-compare form used by the operator
        if inter * 1_000_000 >= round(t * 1_000_000) * union:
            out.add((a, b))
    return out


def test_prefix_jaccard_exact_vs_brute_force(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(60):
        n = rng.randrange(3, 15)
        docs[i] = " ".join(rng.choice(vocab) for _ in range(n))
    # plant some high-similarity pairs
    for i in range(0, 12, 2):
        docs[100 + i] = docs[i]
        docs[200 + i] = docs[i] + " extraword"
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    for t in (0.5, 0.8):
        got = {
            (r.id_a, r.id_b)
            for r in prefix_jaccard_pairs(df, "text", "doc_id", threshold=t).collect()
        }
        assert got == _brute_pairs(docs, t), f"threshold {t}"


def test_prefix_jaccard_micro_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y")], ["doc_id", "text"]
    )
    rows = prefix_jaccard_pairs(df, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.n_common) == (1, 2, 3)
    assert r.jaccard_micro == 600000  # 3/5


# ------------------------------------------------- source containment


def test_source_containment_vs_brute(spark):
    rows = [
        (1, "s1", "alpha beta gamma"),
        (2, "s1", "beta delta"),
        (3, "s2", "alpha beta"),
        (4, "s3", "zeta eta"),
        (5, "s3", "alpha zeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    vocab: dict[str, set[str]] = {}
    for _i, s, txt in rows:
        vocab.setdefault(s, set()).update(_norm_tokens(txt))
    got = {
        (r.src_a, r.src_b): (r.n_a, r.n_b, r.n_common, r.cont_a_micro, r.cont_b_micro)
        for r in source_token_containment(df).collect()
    }
    for a, b in itertools.combinations(sorted(vocab), 2):
        va, vb = vocab[a], vocab[b]
        c = len(va & vb)
        if c == 0:
            assert (a, b) not in got  # inner join drops empty overlap
            continue
        na, nb = len(va), len(vb)
        assert got[(a, b)] == (
            na, nb, c, round(c / na * 1e6), round(c / nb * 1e6)
        )


# ------------------------------------------------------------ Z-order


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_python_morton(spark):
    cells = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 1000)]
    df = spark.createDataFrame(cells, ["ca", "cb"])
    got = df.select(
        "ca", "cb", zorder_key([F.col("ca"), F.col("cb")]).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton2(r.ca, r.cb), (r.ca, r.cb)


def test_zorder_buckets_narrow_on_both_dims(spark):
    # grid of points: a z-ordered bucketing must keep BOTH dims narrow,
    # where a linear sort on x leaves y full-width in every bucket.
    pts = [(x, y) for x in range(0, 4096, 16) for y in range(0, 4096, 16)]
    df = spark.createDataFrame(pts, ["a", "b"])
    stats = zorder_layout_stats(df, ["a", "b"], bucket_bits=4).collect()
    assert len(stats) == 16
    assert sum(r.n_rows for r in stats) == len(pts)
    for r in stats:
        # 4 bucket bits over 32 interleaved bits -> each bucket spans a
        # 2^14-cell quadrant per dim = width_micro 250000
        assert r.a_width_micro <= 250000, r
        assert r.b_width_micro <= 250000, r


# -------------------------------------------------------- boilerplate


def test_template_groups_head_and_tail(spark):
    head = "common license preamble " * 3  # > 48 chars shared head
    tail = " standard unsubscribe footer text here " * 2  # > 48 chars shared tail
    rows = [
        (1, "s1", head + "unique body one"),
        (2, "s2", head + "completely different middle section"),
        (3, "s1", head + "third variant of the body"),
        (4, "s1", "doc body aaa" + tail),
        (5, "s2", "doc body bbb with more words" + tail),
        (6, "s3", "totally unrelated standalone document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = template_groups(df, min_docs=2).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)
    heads = [r for r in by_kind.get("head", []) if r.n_docs >= 3]
    assert len(heads) == 1 and heads[0].rep_doc_id == 1 and heads[0].n_sources == 2
    # docs 4,5 share a tail frame (same last 48 normalized chars)
    tails = [r for r in by_kind.get("tail", []) if r.n_docs == 2]
    assert len(tails) == 1 and tails[0].rep_doc_id == 4
    # min_docs filter: nothing with n_docs == 1 survives
    assert all(r.n_docs >= 2 for r in out)


def test_template_groups_min_docs_gate(spark):
    df = spark.createDataFrame(
        [(1, "s1", "aaa"), (2, "s1", "bbb")], ["doc_id", "source", "text"]
    )
    assert template_groups(df, min_docs=2).count() == 0
