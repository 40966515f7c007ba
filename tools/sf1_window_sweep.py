#!/usr/bin/env python
"""sf1 validation sweep of the bounded-dimension window assumptions
(VERDICT r4 item 4).

The plan sweep (tools/dump_plans.py) allows 84 unpartitioned windows
because each runs over a BOUNDED spine — a value histogram, a calendar
spine, a dictionary dimension — never row-level data.  Those bounds
were argued, not measured, above sf0.1.  This tool runs against the
10x-tiled sf1 dataset (tools/make_sf1.py -> /tmp/omx_sf1) and:

  1. measures every spine-domain class the allowlist justifications
     lean on (distinct n_chars values, calendar days/hours, score
     domains, dictionary dims, session-gap multiset, count-of-counts
     histogram size) at sf0.1 AND sf1 — the point is the GROWTH RATE:
     a bounded spine grows ~1x-2x when rows grow 10x, a row-level leak
     grows ~10x;
  2. runs the top-N slowest extended queries (by the latest recorded
     sf0.1 pass) end-to-end at sf1, so any window that silently went
     corpus-sized shows up as a wall-clock blowup or OOM rather than
     an argument.

Prints one JSON blob and appends a sweep section to BENCH/PLANS.md.

    python tools/make_sf1.py && python tools/sf1_window_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("OMX_SF1_DIR", "/tmp/omx_sf1")
TOP_N = int(os.environ.get("OMX_SWEEP_TOP_N", "30"))
LIMIT = 1_000_000  # the allowlist's "bounded" ceiling

# The tiled sf1 corpus gives every document 9 EXACT copies, which is
# pathological BY CONSTRUCTION for the pair-generating near-dup family:
# candidate pairs grow ~(copies)^2 = 100x, so qa42 exhausted shuffle
# spill disk and q61 ran >45 min before being killed.  That family's
# scale story is (a) exact-dedup-first pipeline order (documented in
# examples/training_data_pipeline.py — near-dup NEVER sees exact dups)
# and (b) its own banding-bound analyses (BENCH/CC_SCALE.md, qc80/qd02
# planners); its members also plan no unpartitioned windows, which is
# what THIS sweep validates.  Excluded, with brute-force pair scorers
# (quadratic in rows by spec) alongside:
EXCLUDE = {
    "qa42_prefix_jaccard",  # exact set-sim join: dup-cluster quadratic
    "q26_minhash_lsh_pairs",  # LSH candidate pairs over 10x dup texts
    "q61_simhash_neardup",  # banded hamming over 10x dup texts
    "q64_dedup_clusters",  # CC closure over the exploded pair set
    "qc81_dedup_savings",  # composes q64
    "qd02_dedup_threshold_sweep",  # composes q27 pairs
    "qd40_cluster_source_mix",  # composes q64
    "qc38_knn_consistency",  # brute-force 20k x 20k pair scorer
    "qd17_triangle_closure",  # triangle listing over the densified graph
}


def domain_probes(spark, sf: str) -> dict[str, int]:
    """Row counts of every spine-domain class the allowlist cites."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))

    out: dict[str, int] = {}
    out["value_hist_n_chars"] = docs.select("n_chars").distinct().count()
    out["dict_lang"] = docs.select("lang").distinct().count()
    out["dict_source"] = docs.select("source").distinct().count()
    out["quasi_id_source_x_len_bucket"] = (
        docs.select("source", (F.col("n_chars") / 100).cast("long")).distinct().count()
    )
    out["calendar_days"] = (
        ev.select(F.to_date("ts").alias("d")).distinct().count()
    )
    out["calendar_day_hours"] = (
        ev.select(F.date_trunc("hour", "ts").alias("h")).distinct().count()
    )
    out["dict_event_type"] = ev.select("event_type").distinct().count()
    out["value_hist_event_value"] = ev.select("value").distinct().count()
    out["dict_users"] = ev.select("user_id").distinct().count()
    # session-gap multiset domain (qd01's spine): distinct per-user
    # successive-ts gaps
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts are NTZ — cast("timestamp") first, then long (epoch s)
    _tl = F.col("ts").cast("timestamp").cast("long")
    out["gap_multiset"] = (
        ev.select("user_id", "event_id", "ts")
        .withColumn("_g", _tl - F.lag(_tl).over(w))
        .where(F.col("_g").isNotNull())
        .select("_g")
        .distinct()
        .count()
    )
    # count-of-counts histogram (zipf/heaps spines): docs per dup-count
    out["count_of_counts_vocab"] = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .count()
        .groupBy("count")
        .count()
        .count()
    )
    out["value_hist_quantity"] = li.select("l_quantity").distinct().count()
    out["value_hist_extendedprice"] = (
        li.select("l_extendedprice").distinct().count()
    )
    out["ship_days"] = li.select(F.to_date("l_shipdate")).distinct().count()
    return out


def main() -> int:
    from ontology_mapper_spark.contract import QUERIES
    from ontology_mapper_spark.session import get_spark

    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run tools/make_sf1.py first", file=sys.stderr)
        return 2

    spark = get_spark(
        app_name="sf1-window-sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )

    domains = {
        "sf0.1": domain_probes(spark, SF01),
        "sf1": domain_probes(spark, SF1),
    }
    over = {
        k: v for k, v in domains["sf1"].items() if v > LIMIT
    }

    # top-N slowest extended queries from the latest recorded pass
    ext_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "extended_latest.json",
    )
    with open(ext_path) as fh:
        ext = json.load(fh)["extended_queries"]
    top = [
        n
        for n, _ in sorted(ext.items(), key=lambda kv: -kv[1])
        if n in QUERIES and n not in EXCLUDE
    ][:TOP_N]

    times: dict[str, float] = {}
    for name in top:
        t0 = time.time()
        try:
            QUERIES[name](spark, SF1).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.time() - t0, 2)
        except Exception as e:  # record, keep sweeping
            times[name] = -1.0
            print(f"[sweep] {name} FAILED: {e}", file=sys.stderr)

    blob = {
        "domains": domains,
        "domains_over_limit": over,
        "sf1_top_query_sec": times,
        "limit": LIMIT,
    }
    print(json.dumps(blob))
    return 0


if __name__ == "__main__":
    sys.exit(main())
