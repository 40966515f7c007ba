"""Filtered negative sampling: determinism, filtering, bounds."""

from __future__ import annotations

from ontology_mapper_spark.operators.negsample import negative_samples


def _pos(spark):
    rows = [
        ("s1", "p", "a"), ("s1", "p", "b"),
        ("s2", "p", "a"), ("s2", "q", "c"), ("s3", "p", "d"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_negatives_never_true_and_in_vocab(spark):
    pos = _pos(spark)
    out = negative_samples(pos, k=3).collect()
    assert out, "sampler produced nothing"
    truth = {(r["subj"], r["pred"], r["obj"]) for r in pos.collect()}
    vocab = {r["obj"] for r in pos.collect()}
    for r in out:
        assert (r["subj"], r["pred"], r["neg_obj"]) not in truth
        assert r["neg_obj"] in vocab
        assert 0 <= r["neg_i"] < 3
    # ≤k per positive, and (pos, neg_i) unique
    keys = [(r["subj"], r["pred"], r["pos_obj"], r["neg_i"]) for r in out]
    assert len(keys) == len(set(keys))


def test_negatives_deterministic_across_runs(spark):
    pos = _pos(spark)
    a = sorted(map(tuple, negative_samples(pos, k=2).collect()))
    b = sorted(map(tuple, negative_samples(pos.repartition(5), k=2).collect()))
    assert a == b  # pure function of the data, not of partitioning
