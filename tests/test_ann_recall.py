"""ANN quality evidence: recall@5 of the approximate top-k operators vs
the exact brute-force ranking on the driver embeddings — determinism alone
is not enough, the buckets must also FIND the true neighbors."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _recall(truth, approx):
    rs = [
        len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth
    ]
    return sum(rs) / len(rs), min(rs)


def test_ann_recall_vs_bruteforce(spark):
    from ontology_mapper_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
        lsh_bucketed_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = _topk_sets(cosine_topk_bruteforce(e, q, k=5))

    # multi-table LSH (4 tables x 4 planes): measured 0.70 mean at this
    # corpus; single-table was 0.34 — the table union is the recall lever
    lsh = _topk_sets(lsh_bucketed_topk(e, q, dim=64, k=5, n_planes=4, n_tables=4))
    lsh_mean, _ = _recall(truth, lsh)
    assert lsh_mean >= 0.55, lsh_mean

    # IVF nprobe=4 of 16 lists: measured 0.68 mean
    ivf = _topk_sets(ivf_topk(e, q, n_centroids=16, nprobe=4, k=5))
    ivf_mean, _ = _recall(truth, ivf)
    assert ivf_mean >= 0.5, ivf_mean

    # more probes monotonically help; at nprobe=16 (all lists) recall is 1
    ivf_all = _topk_sets(ivf_topk(e, q, n_centroids=16, nprobe=16, k=5))
    all_mean, all_min = _recall(truth, ivf_all)
    assert all_mean == 1.0 and all_min == 1.0


def test_multiprobe_lsh_recall_lift(spark):
    """Multi-Probe LSH: probing the 1-bit-flip buckets must lift recall
    over the same table count with no probes, and candidate supersetting
    makes that monotone by construction (probe-0 candidates are a subset
    of probe-4 candidates for identical planes)."""
    from ontology_mapper_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucketed_topk,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = _topk_sets(cosine_topk_bruteforce(e, q, k=5))
    base = _topk_sets(
        lsh_bucketed_topk(e, q, dim=64, k=5, n_planes=4, n_tables=2)
    )
    probed = _topk_sets(
        lsh_bucketed_topk(
            e, q, dim=64, k=5, n_planes=4, n_tables=2, multi_probe=4
        )
    )
    base_mean, _ = _recall(truth, base)
    probed_mean, _ = _recall(truth, probed)
    assert probed_mean >= base_mean
    assert probed_mean >= 0.6, (base_mean, probed_mean)
    # param validation
    import pytest

    with pytest.raises(ValueError):
        lsh_bucketed_topk(e, q, dim=64, n_planes=4, multi_probe=5)
