"""Parity + semantics tests for incremental LSH index maintenance and
multi-round BPE training."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.dedup import (
    banded_index,
    incremental_band_pairs,
    minhash_band_pairs,
    minhash_signatures,
)
from ontology_mapper_spark.operators.textstats import bpe_merge_rounds


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1, "new"
        (11, "completely different text with no overlap at all"),
        (20, "the quick brown fox jumps over the lazy cat"),  # dup of 2, "new"
        (21, "another unrelated document body entirely here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_band_pairs_matches_full_rebuild(spark):
    d = _docs(spark)
    old = d.where(F.col("doc_id") < 10)
    new = d.where(F.col("doc_id") >= 10)
    full = minhash_band_pairs(
        minhash_signatures(d, num_hashes=16, shingle_n=2), "doc_id", 16, 4
    )
    expected = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] >= 10 or r["id_b"] >= 10
    }
    inc = incremental_band_pairs(
        banded_index(minhash_signatures(old, num_hashes=16, shingle_n=2),
                     "doc_id", 16, 4),
        minhash_signatures(new, num_hashes=16, shingle_n=2),
        "doc_id", 16, 4,
    )
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    assert got == expected
    assert expected, "fixture must actually produce new-touching pairs"
    # and it never emits old×old pairs
    assert all(a >= 10 or b >= 10 for a, b in got)


def test_bpe_merge_rounds_greedy_and_iterative(spark):
    # corpus: 'aaaa' x3 -> round 1 must merge (a,a) with GREEDY count:
    # each 'aaaa' contributes 3 adjacent (a,a) pairs -> count 9; after the
    # merge each word is (aa)(aa), so round 2 sees (aa,aa) with count 3.
    d = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    out = {r["round"]: r for r in bpe_merge_rounds(d, rounds=2).collect()}
    assert (out[1]["sym_x"], out[1]["sym_y"], out[1]["pair_count"]) == ("a", "a", 9)
    assert (out[2]["sym_x"], out[2]["sym_y"], out[2]["pair_count"]) == ("aa", "aa", 3)


def test_bpe_merge_rounds_prefix_property(spark):
    """R rounds == R sequential greedy merges: the rule list of a longer
    run must extend the shorter run's list verbatim (each round depends
    only on the vocab state its predecessors produced)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=3,
            max_size=10,
        )
    )
    def check(words):
        d = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        runs = {
            r: [
                (x["round"], x["sym_x"], x["sym_y"], x["pair_count"])
                for x in sorted(
                    bpe_merge_rounds(d, rounds=r).collect(),
                    key=lambda row: row["round"],
                )
            ]
            for r in (1, 2, 3)
        }
        assert runs[1] == runs[3][: len(runs[1])]
        assert runs[2] == runs[3][: len(runs[2])]

    check()


def test_bpe_merge_stopping_rules(spark):
    d = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    # pair exhaustion: after merging (a,b) each word is ONE symbol — no
    # adjacent pairs remain, so rounds=5 stops after 1 rule
    out = bpe_merge_rounds(d, rounds=5).collect()
    assert [(r["round"], r["sym_x"], r["sym_y"]) for r in out] == [
        (1, "a", "b")
    ]
    # min_pair_count: the only pair has corpus count 3 < 4 — no rules
    assert bpe_merge_rounds(d, rounds=5, min_pair_count=4).count() == 0
    # target_vocab: base symbols {a} = 1; budget 2 allows ONE merge
    d2 = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    out2 = bpe_merge_rounds(d2, rounds=5, target_vocab=2).collect()
    assert [(r["round"], r["sym_x"], r["sym_y"]) for r in out2] == [
        (1, "a", "a")
    ]
    # and an empty-result frame still has the contract schema
    empty = bpe_merge_rounds(d2, rounds=5, target_vocab=1)
    assert empty.columns == ["round", "sym_x", "sym_y", "pair_count"]
    assert empty.count() == 0


def test_bpe_merge_no_suffix_false_match(spark):
    # after merging (b,a) -> 'ba', a following 'a' must NOT be merged by a
    # later (a,a) rule through the 'a' inside 'ba'
    d = spark.createDataFrame(
        [(1, "baa baa baa xaa xaa")], "doc_id long, text string"
    )
    out = sorted(
        bpe_merge_rounds(d, rounds=2).collect(), key=lambda r: r["round"]
    )
    # round 1: pairs (b,a)x3, (a,a)x5, (x,a)x2 -> (a,a) wins with 5
    assert (out[0]["sym_x"], out[0]["sym_y"], out[0]["pair_count"]) == ("a", "a", 5)
    # words become b(aa) / x(aa): round 2 top pair is (b,aa) count 3
    assert (out[1]["sym_x"], out[1]["sym_y"], out[1]["pair_count"]) == ("b", "aa", 3)
