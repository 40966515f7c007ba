#!/usr/bin/env python
"""spark-submit entry for the survival / retention audit.

The sixth audit job (next to curation_report / ops_audit / eval_suite /
kg_quality_audit / experiment_audit): the full lifetime-analysis stack
over sessionized user activity, in one pass:

  * Kaplan-Meier survival curve of session lifetimes        (qa67 op)
  * Greenwood pointwise 95% confidence bands                (qc54 op)
  * Nelson-Aalen cumulative hazard                          (qb85 op)
  * Aalen-Johansen competing-risks incidence
    (engaged exit vs bounce exit)                           (qc73 op)
  * RMST at the 1-hour horizon                              (qc12 op)
  * log-rank test between md5-split halves                  (qb91 op)
  * Weibull shape/scale via median-rank regression          (qc57 op)
  * Harrell C-index of the activity score                   (qc48 op)
  * day-0 cohort retention matrix                           (qa59 op)

plus a one-line JSON summary: median survival (first KM duration at or
below 0.5), RMST, Weibull shape, log-rank z, C-index, terminal CIFs.

    spark-submit --py-files engine.zip jobs/retention_audit.py \
        --sf-dir /data/tables --out /data/retention_audit

Local sandbox:

    python jobs/retention_audit.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/retention_audit
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
        app_name="retention-audit",
        master=args.master or "local[4]",
        shuffle_partitions=8,
        driver_memory="4g",
    )
    sf = args.sf_dir
    reports = {
        "kaplan_meier": QUERIES["qa67_kaplan_meier"](spark, sf),
        "greenwood_ci": QUERIES["qc54_greenwood_ci"](spark, sf),
        "nelson_aalen": QUERIES["qb85_nelson_aalen"](spark, sf),
        "aalen_johansen": QUERIES["qc73_aalen_johansen"](spark, sf),
        "rmst": QUERIES["qc12_rmst"](spark, sf),
        "logrank": QUERIES["qb91_logrank"](spark, sf),
        "weibull": QUERIES["qc57_weibull_fit"](spark, sf),
        "c_index": QUERIES["qc48_concordance_index"](spark, sf),
        "cohort_retention": QUERIES["qa59_cohort_retention"](spark, sf),
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

    km_median = one(
        reports["kaplan_meier"]
        .where(F.col("survival_micro") <= 500_000)
        .orderBy("duration")
    )
    aj_last = one(reports["aalen_johansen"].orderBy(F.col("duration").desc()))
    rm = one(reports["rmst"])
    lr = one(reports["logrank"])
    wb = one(reports["weibull"])
    ci = one(reports["c_index"])
    day1 = one(
        reports["cohort_retention"].where(F.col("offset_days") == 1).orderBy(
            "cohort_day"
        )
    )
    summary = {
        "tables": rows,
        "km_median_survival_us": km_median["duration"],
        "rmst_us_micro": rm["rmst_us_micro"],
        "weibull_shape_milli": wb["shape_milli"],
        "weibull_r2_milli": wb["r2_milli"],
        "logrank_z_milli": lr["z_milli"],
        "logrank_signif": lr["signif_flag"],
        "c_index_micro": ci["c_index_micro"],
        "cif_engaged_final_nano": aj_last["cif1_nano"],
        "cif_bounce_final_nano": aj_last["cif2_nano"],
        "day1_retention_micro_first_cohort": day1["retention_micro"],
        "out": args.out,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
