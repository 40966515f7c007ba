#!/usr/bin/env python
"""CC at scale (VERDICT r1 item 4): connected components over a ≥1M-node
synthetic xref graph with a skewed giant component (a hub holding ~30% of
all nodes) — the hot-ontology-class shape the north_star calls out.

Graph (pure functions of N, built distributed — no driver materialization):
* hub star: node 0 ↔ nodes 1..0.3N (giant skewed component; the min()
  aggregation's map-side partial combine is what absorbs the hub skew);
* chain remainder: (i, i+1) for i in [0.3N, N) where i % 7 != 0 → closed-
  form components of ≤7 nodes (same idiom as contract q36, so correctness
  is assertable without a reference run).

Usage: python tools/bench_cc_scale.py [--nodes 1000000] [--cpus 32]
Prints one JSON line; use --write-md to append the result to
BENCH/CC_SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_edges(spark, n_nodes: int):
    from pyspark.sql import functions as F

    hub_n = int(n_nodes * 0.3)
    pad = 10  # zero-pad so lexicographic min == numeric min

    def s(col):
        return F.lpad(col.cast("string"), pad, "0")

    hub = spark.range(1, hub_n).select(
        F.lit("0" * pad).alias("src_iri"), s(F.col("id")).alias("dst_iri")
    )
    chain = (
        spark.range(hub_n, n_nodes - 1)
        .where(F.col("id") % 7 != 0)
        .select(s(F.col("id")).alias("src_iri"), s(F.col("id") + 1).alias("dst_iri"))
    )
    return hub.unionByName(chain), hub_n, pad


def expected_component(node: int, hub_n: int) -> int:
    if node < hub_n:
        return 0
    # chain segments break after every i % 7 == 0 edge gap
    lo = node
    while lo > hub_n and (lo - 1) % 7 != 0:
        lo -= 1
    return lo


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument(
        "--hot-threshold", type=int, default=None,
        help="route nodes above this degree through the explicit hot-key "
             "broadcast join (operators/skewjoin.py) instead of relying on "
             "map-side combine + AQE alone",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapper_spark.pipeline.canonicalize import connected_components
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        driver_memory="16g",
    )
    edges, hub_n, pad = build_edges(spark, args.nodes)
    edges = edges.repartition(args.cpus).persist()
    n_edges = edges.count()  # materialize input outside the timed region

    t0 = time.time()
    stats: dict = {}
    labels = connected_components(
        edges, stats=stats, hot_degree_threshold=args.hot_threshold
    )
    n_labeled = labels.count()
    wall = time.time() - t0

    # correctness spot-checks against the closed form
    giant = labels.where(F.col("component") == "0" * pad).count()
    sample = labels.sample(0.001, seed=7).collect()
    bad = [
        (r["node"], r["component"])
        for r in sample
        if int(r["component"]) != expected_component(int(r["node"]), hub_n)
    ]
    out = {
        "metric": "cc_scale_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "n_nodes": args.nodes,
        "n_edges": n_edges,
        "n_labeled": n_labeled,
        "giant_component_size": giant,
        "giant_fraction": round(giant / args.nodes, 4),
        "iterations": stats.get("iterations"),
        "sampled_label_errors": len(bad),
        "nodes_per_sec": round(n_labeled / wall, 1),
        "cpus": args.cpus,
        "hot_threshold": args.hot_threshold,
    }
    print(json.dumps(out))
    assert not bad, bad[:5]
    assert abs(giant - hub_n) <= 1

    if args.write_md:
        md = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "CC_SCALE.md",
        )
        with open(md, "a") as fh:
            fh.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
