#!/usr/bin/env python
"""spark-submit entry for the temporal/ops health-audit suite.

The event-stream counterpart to jobs/curation_report.py (which audits
document content): runs the round-3 temporal and release monitors over
an `events`-shaped table (+ documents for the release gates) in ONE
job, writes each report as parquet under --out, and prints a one-line
JSON summary — the per-day ops report a 100 TB pipeline lands next to
its metrics:

  * day-of-week seasonality strength per type        (qa64)
  * variance-to-mean dispersion / burstiness         (qa78)
  * lag-1..3 autocorrelation                         (qa70)
  * exponential decay trend + half-life              (qa81)
  * shuffle-balance simulation on the user key       (qa74)
  * behavioral-duplicate (bot) fingerprints          (qa84)
  * shard-parity column profiles (documents)         (qa83)
  * k-anonymity release audit (documents)            (qa62)
  * Benford first-digit deviation (documents sizes)  (qa69)
  * anomalous-day z-scores / seasonal-naive backtest  (qb63/qb72)
  * weekly growth accounting + DAU/WAU/MAU stickiness (qb81/qb78)
  * PSI drift, expectations contract, fairness gaps   (qb69/qb73/qb70)
  * t-closeness release audit, source concentration   (qb71/qb84)

    spark-submit --py-files engine.zip jobs/ops_audit.py \
        --sf-dir /data/tables --out /data/ops_audit

Local sandbox:

    python jobs/ops_audit.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/ops_audit
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

    from ontology_mapper_spark.catalog import load_table
    from ontology_mapper_spark.operators.dialogue import behavior_fingerprints
    from ontology_mapper_spark.operators.privacy import k_anonymity_report
    from ontology_mapper_spark.operators.skew import shuffle_balance_audit
    from ontology_mapper_spark.operators.dialogue import (
        pattern_match_share,
    )
    from ontology_mapper_spark.operators.stats import (
        benford_deviation,
        profile_drift,
        srm_check,
    )
    from ontology_mapper_spark.operators.dq import expectations_report
    from ontology_mapper_spark.operators.evaluate import fairness_audit
    from ontology_mapper_spark.operators.mixing import concentration_panel
    from ontology_mapper_spark.operators.privacy import t_closeness_report
    from ontology_mapper_spark.operators.stats import psi_drift
    from ontology_mapper_spark.operators.temporal import (
        acf_daily,
        anomalous_days,
        decay_trend,
        dispersion_daily,
        event_time_disorder,
        growth_accounting,
        half_life_decayed_counts,
        hour_dow_profile,
        seasonal_naive_backtest,
        seasonal_strength,
        stickiness_daily,
    )
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="ops-audit", master=args.master or "local[4]",
        shuffle_partitions=8, driver_memory="4g",
    )
    events = load_table(spark, args.sf_dir, "events")
    docs = load_table(spark, args.sf_dir, "documents")

    reports = {
        "seasonality": seasonal_strength(events, "event_type"),
        "dispersion": dispersion_daily(events, "event_type"),
        "acf": acf_daily(events, "event_type"),
        "decay": decay_trend(events, "event_type"),
        "shuffle_balance": shuffle_balance_audit(events, "user_id", 64),
        "bot_fingerprints": behavior_fingerprints(
            events.select(
                F.concat_ws(
                    "#", F.col("user_id"), F.to_date("ts").cast("string")
                ).alias("actor"),
                "event_type", "ts", "event_id",
            ),
            "actor", "event_type", ["ts", "event_id"], min_group=2,
        ),
        "profile_parity": profile_drift(
            docs, (F.col("doc_id") % 2),
            ["text", "lang", "source", "n_chars"],
        ),
        "k_anonymity": k_anonymity_report(
            docs,
            ["source", F.floor(F.col("n_chars") / 100).cast("long")],
            "lang", (2, 5, 10),
        ),
        "benford": benford_deviation(docs, "source", "n_chars"),
        "srm": srm_check(events, "user_id", "event_type"),
        "disorder": event_time_disorder(events, "ts", "event_id"),
        "trending": half_life_decayed_counts(events, "ts", "event_type"),
        "hour_dow": hour_dow_profile(events, "ts"),
        "funnel_patterns": pattern_match_share(
            events.select(
                "user_id", "event_type",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                "event_id",
            ),
            "user_id", "event_type", ("us", "event_id"),
            {"browse_to_buy": "v[cv]*p", "double_error": "ee",
             "signup_to_buy": "s.*p"},
        ),
        "anomalous_days": anomalous_days(events, "ts"),
        "backtest": seasonal_naive_backtest(events, "ts", "event_type"),
        "growth": growth_accounting(events, "ts", "user_id"),
        "stickiness": stickiness_daily(events, "ts", "user_id"),
        "psi_drift": psi_drift(
            docs, "n_chars", F.col("doc_id") % 2 == 1,
            bin_width=100, n_bins=10,
        ),
        "expectations": expectations_report(
            docs,
            [
                {"rule_id": "r01", "column": "doc_id", "type": "not_null"},
                {"rule_id": "r02", "column": "doc_id", "type": "unique"},
                {"rule_id": "r03", "column": "text", "type": "not_null"},
                {"rule_id": "r04", "column": "n_chars", "type": "range",
                 "lo": 1, "hi": 10000},
            ],
        ),
        "fairness": fairness_audit(
            docs, F.col("n_chars") >= 600, F.col("lang") == "en",
            "source",
        ),
        "t_closeness": t_closeness_report(
            events.select(
                "event_type",
                F.expr(
                    "(unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
                    " + 4) % 7"
                ).alias("dow"),
                F.expr("CAST(round(value * 100) AS LONG) div 1000")
                .alias("_sb"),
            ),
            ["event_type", "dow"], F.col("_sb"), n_buckets=10,
        ),
        "concentration": concentration_panel(docs, "lang", "source"),
    }
    rows = {}
    for name, df in reports.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
        rows[name] = spark.read.parquet(os.path.join(args.out, name)).count()

    # headline summary: the numbers a dashboard would alert on
    disp = {
        r["event_type"]: r for r in reports["dispersion"].collect()
    }
    seas = {r["event_type"]: r for r in reports["seasonality"].collect()}
    bal = reports["shuffle_balance"].agg(
        F.max("balance_micro").alias("mx")
    ).collect()[0]["mx"]
    k5 = {
        r["k"]: r for r in k_anonymity_report(
            docs,
            ["source", F.floor(F.col("n_chars") / 100).cast("long")],
            "lang", (5,),
        ).collect()
    }[5]
    n_bot = reports["bot_fingerprints"].count()
    n_srm = reports["srm"].agg(F.sum("srm_flag").alias("s")).collect()[0]["s"]
    worst_p99 = reports["disorder"].agg(
        F.max("p99_disorder_s").alias("m")
    ).collect()[0]["m"]
    top_trend = (
        reports["trending"]
        .orderBy(F.col("share_micro").desc(), "event_type")
        .limit(1)
        .collect()
    )
    max_resid = reports["hour_dow"].agg(
        F.max(F.abs(F.col("resid_milli"))).alias("m")
    ).collect()[0]["m"]
    summary = {
        "tables": rows,
        "worst_vmr_micro": max(
            (r["vmr_micro"] for r in disp.values() if r["vmr_micro"]),
            default=None,
        ),
        "max_seasonality_r2_micro": max(
            (r["r2_dow_micro"] for r in seas.values() if r["r2_dow_micro"]),
            default=None,
        ),
        "max_partition_balance_micro": bal,
        "k5_rows_at_risk": k5["rows_below"],
        "k5_min_l_diversity": k5["min_l_diversity"],
        "n_duplicated_behavior_groups": n_bot,
        "n_srm_flags": int(n_srm) if n_srm is not None else 0,
        "watermark_p99_disorder_s": worst_p99,
        "top_trending_type": top_trend[0]["event_type"] if top_trend else None,
        "max_hour_dow_resid_milli": max_resid,
        "n_anomalous_days": int(
            reports["anomalous_days"]
            .agg(F.sum("anomaly_flag").alias("s")).collect()[0]["s"] or 0
        ),
        "worst_mase_micro": reports["backtest"].agg(
            F.max("mase_micro").alias("m")).collect()[0]["m"],
        "latest_quick_ratio_milli": (lambda r: r[0]["quick_ratio_milli"]
                                     if r else None)(
            reports["growth"].orderBy(F.col("week").desc()).take(1)
        ),
        "psi_level": (lambda r: r[0]["drift_level"] if r else None)(
            reports["psi_drift"].take(1)
        ),
        "n_failed_expectations": int(
            reports["expectations"].where(F.col("ok") == 0).count()
        ),
        "n_di_flags": int(
            reports["fairness"].agg(
                F.sum("di_flag").alias("s")).collect()[0]["s"] or 0
        ),
        "n_t_closeness_flags": int(
            reports["t_closeness"].agg(
                F.sum("t_flag").alias("s")).collect()[0]["s"] or 0
        ),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
