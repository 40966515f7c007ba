#!/usr/bin/env python
"""Dedup-at-scale evidence: the full near-dup pipeline (minhash signatures
→ LSH banding join → transitive clustering) on synthetic corpora at two
sizes, 4× apart — the same fixed-input-two-sizes methodology as
BENCH/CC_SCALE.md. The claim being evidenced: candidate generation stays
an equi-join (no all-pairs), so cost grows ~linearly in docs and the
docs/sec rate RISES with corpus size as fixed per-job costs amortize.

The corpus is generated IN SPARK (expression-only, no driver data): each
doc is `doc_len` words drawn from a 1000-word vocab by xxhash64(doc_id,
position); every 10th doc gets a planted near-duplicate (first word
dropped, id offset) so the LSH path has real work to find. Deterministic
by construction.

Writes BENCH/DEDUP_SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_corpus(spark, n_docs: int, doc_len: int = 40):
    from pyspark.sql import functions as F

    vocab = [f"w{i:04d}" for i in range(1000)]
    vlit = F.lit(vocab)
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(doc_len - 1)),
                lambda i: F.element_at(
                    vlit,
                    (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) + 1).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    mutants = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.regexp_replace("text", r"^\S+ ", "").alias("text"),
    )
    return base.unionByName(mutants)


def run_once(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from ontology_mapper_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup,
        minhash_band_pairs,
        minhash_signatures,
    )

    docs = synth_corpus(spark, n_docs).persist()
    n_total = docs.count()  # materialize input before the clock starts

    t0 = time.time()
    exact_dedup(docs).write.format("noop").mode("overwrite").save()
    t_exact = time.time() - t0

    t0 = time.time()
    sig = minhash_signatures(docs, "text", "doc_id", num_hashes=16, shingle_n=3)
    pairs = minhash_band_pairs(sig, "doc_id", num_hashes=16, bands=4).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    t0 = time.time()
    clusters = dedup_clusters(pairs)
    n_clustered = clusters.count()
    n_clusters = clusters.agg(F.countDistinct("cluster_rep")).first()[0]
    t_cluster = time.time() - t0

    pairs.unpersist()
    docs.unpersist()
    return {
        "n_docs": n_total,
        "exact_sec": round(t_exact, 2),
        "lsh_pairs_sec": round(t_pairs, 2),
        "cluster_sec": round(t_cluster, 2),
        "total_sec": round(t_exact + t_pairs + t_cluster, 2),
        "n_candidate_pairs": n_pairs,
        "n_clustered_docs": n_clustered,
        "n_clusters": n_clusters,
        "docs_per_sec": round(n_total / (t_exact + t_pairs + t_cluster), 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=100_000)
    ap.add_argument("--large", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REPO)
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    run_once(spark, 5_000)  # warm: codegen, shuffle services
    small = run_once(spark, args.small)
    large = run_once(spark, args.large)

    ratio = large["total_sec"] / small["total_sec"]
    size_ratio = large["n_docs"] / small["n_docs"]
    result = {
        "job": "exact dedup + minhash16 LSH banding + transitive clustering",
        "small": small,
        "large": large,
        "size_ratio": round(size_ratio, 2),
        "time_ratio": round(ratio, 2),
        "rate_change": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
        "cpus": args.cpus,
    }

    md = f"""# BENCH/DEDUP_SCALE — near-dup pipeline at two corpus sizes

Same methodology as CC_SCALE: the identical job (exact content-hash
dedup, then minhash-16 signatures → 4-band LSH equi-join → transitive
clustering over candidate pairs) at two corpus sizes {size_ratio:.0f}×
apart, local[{args.cpus}]. Corpus is expression-generated in Spark
(1000-word vocab, 40-word docs, every 10th doc gets a planted
first-word-dropped near-duplicate) — deterministic, no driver data.

| corpus | docs | candidate pairs | clustered docs | exact s | LSH s | cluster s | total s | docs/sec |
|---|---|---|---|---|---|---|---|---|
| small | {small['n_docs']:,} | {small['n_candidate_pairs']:,} | {small['n_clustered_docs']:,} | {small['exact_sec']} | {small['lsh_pairs_sec']} | {small['cluster_sec']} | {small['total_sec']} | {small['docs_per_sec']:,} |
| large | {large['n_docs']:,} | {large['n_candidate_pairs']:,} | {large['n_clustered_docs']:,} | {large['exact_sec']} | {large['lsh_pairs_sec']} | {large['cluster_sec']} | {large['total_sec']} | {large['docs_per_sec']:,} |

{size_ratio:.0f}× the docs cost {ratio:.2f}× the time — docs/sec
{'rises' if result['rate_change'] > 1 else 'changes by ' + str(result['rate_change']) + '×'}
with scale as fixed per-job costs amortize, which is the property that
matters at 100 TB: every stage is a hash shuffle or an equi-join on
banded keys (never all-pairs), so cost is linear in corpus size with
bounded per-key fan-in (stop-shingle caps bound hot shingles; the
banding join's per-bucket cost is bounded by band width; clustering runs
on LSH-pruned pairs only, size-gated driver-local below 250k edges with
automatic fall-through to the distributed loop).
"""
    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
