#!/usr/bin/env python
"""ANN at scale: IVF-flat top-k over a ≥1M-vector synthetic 64-dim corpus
— timing for the index-assignment + probe-join path (the qa46/q48 scale
architecture) plus measured recall@k against brute-force ground truth on
a query sample.

Vectors are pure functions of (id, dim) — component =
(xxhash64(id ':' dim) mod 2001 − 1000)/1000 ∈ [−1, 1] — so any run, any
partitioning, any engine builds the identical corpus (same discipline as
the contract queries; no RNG state).

Usage:
  python tools/bench_ann_scale.py [--vectors 1000000] [--cpus 32]
      [--centroids 64] [--nprobe 4] [--k 10] [--queries 1000]
      [--recall-sample 50] [--write-md]

Prints ONE JSON line. For a scaling pair, run twice under taskset:
  taskset -c 0-7  python tools/bench_ann_scale.py --cpus 8  ...
  taskset -c 0-31 python tools/bench_ann_scale.py --cpus 32 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def build_vectors(spark, n: int, cpus: int):
    from pyspark.sql import functions as F

    comps = [
        (
            (
                F.pmod(
                    F.xxhash64(F.concat_ws(":", F.col("id"), F.lit(j))), F.lit(2001)
                )
                - 1000
            )
            / 1000.0
        ).alias(f"c{j}")
        for j in range(DIM)
    ]
    return (
        spark.range(n)
        .repartition(cpus)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*comps).alias("embedding"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--centroids", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--recall-sample", type=int, default=50)
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ontology_mapper_spark.operators.similarity import (
        cosine_micro_col,
        ivf_topk,
    )
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        driver_memory="16g",
    )
    corpus = build_vectors(spark, args.vectors, args.cpus).persist()
    n = corpus.count()  # materialize outside the timed region

    queries = corpus.where(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.time()
    topk = ivf_topk(
        corpus,
        queries,
        n_centroids=args.centroids,
        nprobe=args.nprobe,
        k=args.k,
    )
    n_results = topk.count()
    wall = time.time() - t0

    # recall@k vs brute force on a query sample (outside the timed region)
    sample_q = queries.where(F.col("vec_id") < args.recall_sample).select(
        "query_id", F.col("embedding").alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(sample_q)).select(
        "query_id",
        "vec_id",
        cosine_micro_col(
            F.col("embedding").cast("array<double>"),
            F.col("_qvec").cast("array<double>"),
        ).alias("cosine_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_micro").desc(), F.col("vec_id")
    )
    exact = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= args.k)
        .select("query_id", "vec_id")
    )
    approx = topk.where(F.col("query_id") < args.recall_sample).select(
        "query_id", "vec_id"
    )
    hits = exact.join(approx, ["query_id", "vec_id"]).count()
    denom = exact.count()

    out = {
        "metric": "ann_ivf_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "n_vectors": n,
        "dim": DIM,
        "n_centroids": args.centroids,
        "nprobe": args.nprobe,
        "k": args.k,
        "n_queries": args.queries,
        "n_results": n_results,
        "queries_per_sec": round(args.queries / wall, 1),
        "assign_rows_per_sec": round(n * 1 / wall, 1),
        "recall_at_k": round(hits / max(denom, 1), 4),
        "recall_sample": args.recall_sample,
        "cpus": args.cpus,
    }
    print(json.dumps(out))

    if args.write_md:
        md = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "ANN_SCALE.md",
        )
        header_needed = not os.path.exists(md)
        with open(md, "a") as fh:
            if header_needed:
                fh.write(
                    "# IVF ANN at scale — synthetic 1M x 64-dim corpus\n\n"
                    "Deterministic hash-derived vectors; timed region = full\n"
                    "ivf_topk (centroid pick + 1M-corpus assignment + probe\n"
                    "join + rescore + rank). recall@k measured vs brute-force\n"
                    "ground truth on a query sample, outside the timed\n"
                    "region. Runs taskset-pinned when used for N-vs-4N\n"
                    "scaling pairs.\n\n"
                )
            fh.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
