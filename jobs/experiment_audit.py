#!/usr/bin/env python
"""spark-submit entry for the experimentation & attribution audit.

The fifth audit job (next to curation_report / ops_audit / eval_suite /
kg_quality_audit): everything an experimentation platform wants to know
about segment differences, channel credit, and score trustworthiness,
in one pass over the event/document tables:

  * attribution model comparison: last-touch vs linear vs U-shaped vs
    time-decay vs Shapley vs Markov removal, side by side  (qb40/qb42/
    qc09/qb77/qb76/qc07 ops)
  * targeting uplift: Qini curve + coefficient under the md5 treatment
    split                                                   (qc08 op)
  * nonparametric battery: Kruskal-Wallis omnibus, Jonckheere ordered
    trend, Friedman day-controlled, Cochran's Q reach       (qc04/qc15/
    qc05/qc16 ops)
  * calibration: Brier + Murphy decomposition               (qc13 op)
  * agreement: Fleiss kappa vs Gwet AC1 on the same panel   (qa61/qc14)
  * equivalence ship gate (TOST), KW post-hoc pair flags (Dunn),
    bounded drift distances (Hellinger/TV)                  (qc25/qc32/
    qc31 ops)

plus a one-line JSON summary: per-model top channel, qini coefficient,
the four test statistics, and the calibration split.

    spark-submit --py-files engine.zip jobs/experiment_audit.py \
        --sf-dir /data/tables --out /data/experiment_audit

Local sandbox:

    python jobs/experiment_audit.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/experiment_audit
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
        app_name="experiment-audit",
        master=args.master or "local[4]",
        shuffle_partitions=8,
        driver_memory="4g",
    )
    sf = args.sf_dir
    attribution = {
        "last_touch": QUERIES["qb40_last_touch"](spark, sf),
        "linear": QUERIES["qb42_linear_attribution"](spark, sf),
        "position": QUERIES["qc09_position_attribution"](spark, sf),
        "time_decay": QUERIES["qb77_time_decay_attribution"](spark, sf),
        "shapley": QUERIES["qb76_shapley_attribution"](spark, sf),
        "markov_removal": QUERIES["qc07_markov_removal"](spark, sf),
    }
    reports = {
        **{f"attribution_{k}": v for k, v in attribution.items()},
        "qini": QUERIES["qc08_qini_curve"](spark, sf),
        "kruskal_wallis": QUERIES["qc04_kruskal_wallis"](spark, sf),
        "jonckheere": QUERIES["qc15_jonckheere"](spark, sf),
        "friedman": QUERIES["qc05_friedman"](spark, sf),
        "cochran_q": QUERIES["qc16_cochran_q"](spark, sf),
        "brier": QUERIES["qc13_brier_decomposition"](spark, sf),
        "fleiss": QUERIES["qa61_fleiss_kappa"](spark, sf),
        "gwet_ac1": QUERIES["qc14_gwet_ac1"](spark, sf),
        "tost": QUERIES["qc25_tost_equivalence"](spark, sf),
        "dunn": QUERIES["qc32_dunn_posthoc"](spark, sf),
        "hellinger_tv": QUERIES["qc31_hellinger_tv"](spark, sf),
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

    # per-model winning channel (largest credit; 'none' bucket excluded
    # where the model reports one)
    top_channel = {}
    for k in ("last_touch", "linear", "position", "time_decay"):
        col = "credit_micro" if k != "last_touch" else None
        df = attribution[k]
        if col is None:
            # last-touch reports counts per channel
            cand = [c for c in df.columns if c.startswith("n_") or c == "n"]
            order = F.col(cand[0]).desc() if cand else F.col(df.columns[-1]).desc()
            r = one(df.where(F.col(df.columns[0]) != "none").orderBy(order))
        else:
            r = one(
                df.where(F.col("touch_type") != "none").orderBy(
                    F.col(col).desc()
                )
            )
        top_channel[k] = r[df.columns[0]]
    top_channel["shapley"] = one(
        attribution["shapley"].orderBy(F.col("credit_micro").desc())
    )["channel"]
    top_channel["markov_removal"] = one(
        attribution["markov_removal"].orderBy(F.col("credit_micro").desc())
    )["channel"]

    qini = one(reports["qini"])
    kw = one(reports["kruskal_wallis"])
    jt = one(reports["jonckheere"])
    fr = one(reports["friedman"])
    cq = one(reports["cochran_q"])
    br = one(reports["brier"])
    to = one(reports["tost"])
    he = one(reports["hellinger_tv"])
    n_sig_pairs = reports["dunn"].where(F.col("significant")).count()
    fk = one(reports["fleiss"])
    ac = one(reports["gwet_ac1"])
    summary = {
        "tables": rows,
        "top_channel_by_model": top_channel,
        "qini2_milli": qini["qini2_milli"],
        "kw_h_tie_milli": kw["h_tie_milli"],
        "jt_z_milli": jt["z_milli"],
        "friedman_chi2_milli": fr["chi2_milli"],
        "cochran_q_milli": cq["q_milli"],
        "brier_micro": br["brier_micro"],
        "brier_rel_micro": br["rel_micro"],
        "tost_equivalent": to["equivalent"],
        "dunn_significant_pairs": n_sig_pairs,
        "hellinger_micro": he["hellinger_micro"],
        "tv_micro": he["tv_micro"],
        "fleiss_kappa_micro": fk["kappa_micro"],
        "gwet_ac1_micro": ac["ac1_micro"],
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
