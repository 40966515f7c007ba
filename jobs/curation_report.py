#!/usr/bin/env python
"""spark-submit entry for the corpus curation-monitor suite.

Runs every distribution/quality monitor the engine provides over a
`documents`-shaped table in ONE job and writes the results as
partitioned parquet metrics tables plus a one-line JSON summary —
the per-ingest-batch health report a 100 TB pipeline lands next to
its data (the north rule's "metrics rows", applied to curation):

  * source mix + exact cross-source leakage     (qa21)
  * per-source token entropy / KL divergence    (qa07 / qa29)
  * Zipf slope (template-spam detector)         (qa30)
  * per-source low-quality rate w/ Wilson CI    (qa38)
  * split balance chi-square                    (qa39)
  * vocabulary gaps vs a term dictionary        (qa36, when terms given)
  * NB source-separability accuracy             (qa25)

    spark-submit --py-files engine.zip jobs/curation_report.py \
        --docs /data/corpus --out /data/corpus_report

Local sandbox:

    python jobs/curation_report.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/curation_report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default=None,
                    help="driver testdata dir (reads documents.parquet)")
    ap.add_argument("--docs", default=None,
                    help="explicit parquet path of a documents-shaped table")
    ap.add_argument("--master", default=None)
    ap.add_argument("--quality-defect-milli", type=int, default=60000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="curation-report",
        master=args.master or "local[4]",
        shuffle_partitions=8,
        driver_memory="4g",
    )
    if args.docs:
        docs = spark.read.parquet(args.docs)
    else:
        sf = args.sf_dir or "/root/testdata/sf0.001"
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

    from ontology_mapper_spark.operators.classify import nb_label_scores
    from ontology_mapper_spark.operators.dedup import cross_source_leakage
    from ontology_mapper_spark.operators.split import train_test_split
    from ontology_mapper_spark.operators.stats import (
        chi2_contingency,
        kl_divergence,
        token_entropy,
        wilson_bounds,
        zipf_moments,
    )
    from ontology_mapper_spark.operators.textstats import (
        with_quality_score,
        words_col,
    )

    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)
    summary: dict = {}

    def land(name: str, df) -> list[dict]:
        rows = [r.asDict() for r in df.collect()]
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
        return rows

    # tokens feed three monitors; one select, reused plan
    tok = docs.select("source", F.explode(words_col(F.col("text"))).alias("w"))

    leak = land("leakage", cross_source_leakage(docs))
    summary["worst_leak_micro"] = max((r["leak_micro"] for r in leak), default=0)

    ent = land("entropy", token_entropy(tok, "source", "w"))
    summary["min_entropy_micro"] = min(
        (r["entropy_micro"] for r in ent), default=0
    )

    kl = land("kl_divergence", kl_divergence(tok, "source", "w"))
    summary["max_kl_micro"] = max((r["kl_micro"] for r in kl), default=0)

    zipf = land("zipf", zipf_moments(tok.select("w"), "w"))
    summary["zipf_slope_micro"] = zipf[0]["slope_micro"] if zipf else None

    flagged = with_quality_score(docs, "text").select(
        "source",
        (
            F.round(F.col("quality_score") * 1000).cast("long")
            < args.quality_defect_milli
        ).alias("defect"),
    )
    wil = land("quality_wilson", wilson_bounds(flagged, "source", "defect"))
    summary["worst_quality_lo_micro"] = max(
        (r["wilson_lo_micro"] for r in wil), default=0
    )

    chi = land(
        "split_balance",
        chi2_contingency(train_test_split(docs, "doc_id"), "split", "source"),
    )
    summary["split_chi2_micro"] = chi[0]["chi2_micro"] if chi else None
    summary["split_chi2_dof"] = chi[0]["dof"] if chi else None

    nb = nb_label_scores(docs, "source", "text", "doc_id")
    acc = land(
        "nb_separability",
        nb.groupBy("source").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("correct").cast("long").alias("n_correct"),
        ),
    )
    summary["worst_nb_acc_micro"] = min(
        (round(r["n_correct"] * 1e6 / r["n"]) for r in acc if r["n"]),
        default=0,
    )

    summary["n_docs"] = docs.count()
    summary["wall_sec"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2, sort_keys=True)
    print(json.dumps(summary, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
