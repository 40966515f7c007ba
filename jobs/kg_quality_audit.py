#!/usr/bin/env python
"""spark-submit entry for the KG quality audit.

The fourth audit job (next to curation_report / ops_audit / eval_suite):
everything a KG build should know about its OWN output before
canonicalization and release, in one pass:

  * per-predicate cardinality/functionality profile         (qb16 op)
  * linker-confidence margins over the decision table       (qb17 op)
  * per-ontology mention coverage (the reference's JSON
    mapping report, corpus-wide)                            (qa35)
  * ontology gap mining: top unmatched spans                (qa36)
  * P/R threshold sweep of the link scores vs rank-1 gold   (qa33)
  * day-over-day entity turnover of the event stream        (qb27 op)

plus a one-line JSON summary: predicate count, worst-functionality
predicate, ambiguous-pattern share, coverage by ontology, and the
acceptance threshold that keeps P >= 0.95.

    spark-submit --py-files engine.zip jobs/kg_quality_audit.py \
        --sf-dir /data/tables --out /data/kg_audit

Local sandbox:

    python jobs/kg_quality_audit.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/kg_audit
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontology_mapper_spark.contract import QUERIES
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="kg-quality-audit",
        master=args.master or "local[4]",
        shuffle_partitions=8,
        driver_memory="4g",
    )
    sf = args.sf_dir
    reports = {
        "predicate_cardinality": QUERIES["qb16_predicate_cardinality"](spark, sf),
        "link_margins": QUERIES["qb17_link_margins"](spark, sf),
        "ontology_coverage": QUERIES["qa35_ontology_coverage"](spark, sf),
        "vocabulary_gaps": QUERIES["qa36_vocabulary_gaps"](spark, sf),
        "pr_sweep": QUERIES["qa33_pr_sweep"](spark, sf),
        "entity_turnover": QUERIES["qb27_entity_turnover"](spark, sf),
    }
    rows = {}
    for name, df in reports.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
        rows[name] = spark.read.parquet(os.path.join(args.out, name)).count()

    class _Empty:
        def __getitem__(self, _key):
            return None

    def one(df):
        r = df.take(1)
        return r[0] if r else _Empty()

    worst_fn = one(
        reports["predicate_cardinality"].orderBy(
            F.col("functionality_micro").asc(), F.col("pred")
        )
    )
    amb = one(
        reports["link_margins"].agg(
            F.count("*").alias("n"),
            F.sum(F.col("ambiguous").cast("long")).alias("n_amb"),
        )
    )
    cov = {
        r["ontology"]: r["share_micro"]
        for r in reports["ontology_coverage"].collect()
    }
    # smallest threshold keeping precision >= 0.95 (sweep is cumulative
    # from the strongest score down)
    p95 = one(
        reports["pr_sweep"]
        .where(F.col("precision_micro") >= 950_000)
        .orderBy(F.col("threshold_micro").asc())
    )
    summary = {
        "tables": rows,
        "n_predicates": rows["predicate_cardinality"],
        "worst_functionality_pred": worst_fn["pred"],
        "worst_functionality_micro": worst_fn["functionality_micro"],
        "n_patterns": amb["n"],
        "n_ambiguous_patterns": amb["n_amb"],
        "ontology_share_micro": cov,
        "p95_threshold_micro": p95["threshold_micro"],
        "p95_recall_micro": p95["recall_micro"],
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
