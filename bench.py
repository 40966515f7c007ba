#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports kg_turns_per_sec — throughput of the KG flagship
(mention-detect + link-score over seeded synthetic transcripts), the number
the scaling study (tools/bench_scaling.py) tracks at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q15_tpch_q1",
    "q01_pruned_scan_agg",
    "q17_topk_per_group",
    "q22_stable_order_window",
    "q25_exact_dedup",
    "q26_minhash_lsh_pairs",
    "q27_ngram_jaccard",
    "q29_cosine_topk",
    "q31_text_stats",
    "q34_mention_detect",
    "q35_comention_edges",
    "q36_connected_components",
]

# EXTENDED is derived from the contract at runtime (VERDICT r4 item 2:
# every non-headline contract query gets a recorded timing — a
# hand-curated list silently drops newly-added queries from the record).
def extended_names(queries: dict) -> list[str]:
    return sorted(n for n in queries if n not in HEADLINE)

KG_N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))


def kg_flagship_throughput(
    spark, n_convs: int = KG_N_CONVS, passes: int = 5
) -> tuple[float, int, list[float]]:
    """(median turns/sec, n_turns, all-pass turns/sec) for mention-detect +
    link-score end-to-end. Median-of-N because single passes on a shared
    box show 2x outliers (BENCH_r01's 606k vs 1.29M at local[32]) — the
    same variance control tools/bench_scaling.py already applies."""
    import statistics

    from pyspark.sql import functions as F

    from ontology_mapper_spark.datagen import build_snapshot, build_transcripts
    from ontology_mapper_spark.datagen.snapshot import ontology_terms_rows
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )

    terms, _ = build_snapshot(spark, n_terms=200, seed=42)
    labels = sorted({r["label"] for r in ontology_terms_rows(200, 42)})
    tr = build_transcripts(
        spark, n_convs=n_convs, seed=42, mention_labels=labels
    ).persist()
    n_turns = tr.count()  # materialize input before the clock starts
    pats = build_dictionary(terms)
    tps: list[float] = []
    for _ in range(passes):
        t0 = time.time()
        mentions = detect_mentions(spark, tr, pats)
        links = link_mentions(spark, mentions, terms, idf=None)
        links.agg(F.count("*")).collect()
        tps.append(n_turns / (time.time() - t0))
    tr.unpersist()
    return statistics.median(tps), n_turns, [round(x, 1) for x in tps]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ontology_mapper_spark.contract import QUERIES
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    # Warmup pass at the smallest SF: JIT/codegen + Python-UDF worker pools
    # start once; steady-state is what a long-running cluster job sees.
    # Extended queries warm too — same methodology as the headline set.
    warm_dir = "/root/testdata/sf0.001"
    t_phase = time.time()
    EXTENDED = extended_names(QUERIES)
    if os.path.isdir(warm_dir):
        for name in HEADLINE + EXTENDED:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        kg_flagship_throughput(spark, n_convs=200, passes=1)
    print(f"[bench] warmup {time.time() - t_phase:.1f}s", file=sys.stderr)
    t_phase = time.time()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(f"[bench] headline {time.time() - t_phase:.1f}s", file=sys.stderr)
    t_phase = time.time()
    # round-2+ operators, timed but NOT counted into the headline metric
    # (keeps `value` comparable across rounds while still recording them)
    extended: dict[str, float] = {}
    for name in EXTENDED:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        extended[name] = round(time.time() - t0, 3)

    print(f"[bench] extended {time.time() - t_phase:.1f}s", file=sys.stderr)
    t_phase = time.time()
    # headline charges ONE flagship pass (median of the 5 timed passes) so
    # `value` measures the same work as round 1; the per-pass list and the
    # median throughput stay separate fields (VERDICT r2 item 3).
    turns_per_sec, n_turns, tps_passes = kg_flagship_throughput(spark)
    timings["kg_flagship"] = round(n_turns / turns_per_sec, 3)

    # full 4-stage pipeline (detect → link → canonicalize → materialize),
    # fresh run including all table writes — the end-to-end KG number
    import shutil
    import tempfile

    from ontology_mapper_spark.pipeline.runner import PipelineRunner

    out_dir = tempfile.mkdtemp(prefix="omx-bench-kg-")
    t0 = time.time()
    PipelineRunner(
        spark, out_dir, n_convs=2000, n_terms=200, resume=False
    ).run()
    timings["kg_pipeline_e2e"] = round(time.time() - t0, 3)
    shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    # Extended timings go to a side file + stderr, NOT the stdout JSON line:
    # the driver records only the last 2000 chars of stdout, and r3's 132
    # extended entries (~12 KB) pushed the headline fields off the front
    # (BENCH_r03.json parsed: null). The stdout line must stay short enough
    # to survive the tail capture whole.
    ext_blob = json.dumps(
        {"extended_queries": extended, "sf": sf, "cpus": int(cpus)}
    )
    print(f"[bench] extended_queries {ext_blob}", file=sys.stderr)
    try:
        os.makedirs(os.path.join(os.path.dirname(__file__), "BENCH"), exist_ok=True)
        with open(
            os.path.join(os.path.dirname(__file__), "BENCH", "extended_latest.json"),
            "w",
        ) as f:
            f.write(ext_blob + "\n")
    except OSError:
        pass  # read-only checkout: stderr record above still has the data
    line = json.dumps(
        {
            "metric": "headline_suite_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "kg_turns_per_sec": round(turns_per_sec, 1),
            "kg_turns_per_sec_passes": tps_passes,
            "kg_n_turns": n_turns,
            "cpus": int(cpus),
            # duplicate headline scalar as the LAST key so even a truncated
            # tail capture still carries the round's headline number
            "headline_sec": total,
        }
    )
    assert len(line) < 1900, f"bench stdout line too long ({len(line)} chars)"
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
