#!/usr/bin/env python
"""Training-data curation pipeline over the `documents` table — the
LLM-data operators composed end to end, the way a corpus-cleaning job
would chain them at 100 TB:

  0. Unicode NFC + control scrub (ASCII rows never leave the JVM) and
     a per-source cross-source leakage report;
  1. exact dedup (content-hash window rank, one shuffle);
  2. MinHash-LSH near-dup clustering (banded equi-join → connected
     components), keep each cluster's min-id representative;
  3. quality gates: Gopher-style top-bigram repetition fraction, the
     heuristic quality score, the bigram-LM perplexity proxy, and the
     top-k-vocab OOV rate — each a single scan-composable signal;
  4. benchmark decontamination: drop docs sharing any word 3-gram with
     the held-out benchmark set (inverted-index semi-join, never
     all-pairs);
  5. per-language length-percentile trim (exact rank rule, deterministic
     under any partitioning);
  6. corpus-model monitors: Naive Bayes source-separability accuracy
     (a source whose docs stop classifying as themselves has drifted or
     been contaminated) and DSIR target-domain importance weights
     carried as a column for downstream sampling;
  7. deterministic hash split into train/valid/test;
  8. importance-weight sanity: ROC-AUC of the DSIR weight as a ranker
     of target-domain docs (a weight that can't rank its own target
     above the rest is mis-specified);
  9. release audit: k-anonymity / l-diversity over (source,
     length-bucket) quasi-identifiers before any per-document slice
     leaves the pipeline;
 10. eval-budget design: Neyman-optimal allocation of a fixed eval
     budget across sources (size x spread), computed on the valid
     split;
 13. audit-job handoff: the experimentation/attribution audit
     (jobs/experiment_audit.py) and the survival/retention audit
     (jobs/retention_audit.py) run as closing subprocesses over the
     same sf_dir — with this, every one of the six spark-submit audit
     jobs has an example-proven invocation (the other four are
     exercised by jobs/run_pipeline.py + the curation/ops/eval/kg
     stages above).  Skip with OMX_SKIP_AUDIT_JOBS=1.

Every operator used here is individually DuckDB-oracled (q25/q26/q64/q63/
q59/q66/q67/q68/q62/qa25/qa26/qa65/qa62/qa71); this example shows the
composition.

    python examples/training_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ontology_mapper_spark.operators.dedup import (  # noqa: E402
    dedup_clusters,
    exact_dedup,
    minhash_band_pairs,
    minhash_signatures,
)
from ontology_mapper_spark.operators.decontaminate import (  # noqa: E402
    decontaminate,
)
from ontology_mapper_spark.operators.split import train_test_split  # noqa: E402
from ontology_mapper_spark.operators.textstats import (  # noqa: E402
    bigram_nll,
    percentile_trim,
    repetition_stats,
    with_quality_score,
)
from ontology_mapper_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark(
        app_name="training-data-pipeline", master="local[4]",
        shuffle_partitions=8, driver_memory="4g",
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    raw_docs = docs  # pre-scrub snapshot for the stage-12 drift gate
    n0 = docs.count()

    # 0. NFC + control scrub (codepoint canonicalization BEFORE any
    # hashing, or composed/decomposed twins defeat every dedup stage);
    # plus the cross-source exact-leakage monitor on the scrubbed text
    from ontology_mapper_spark.operators.dedup import cross_source_leakage
    from ontology_mapper_spark.operators.unicode_norm import nfc_scrub

    clean_text = nfc_scrub(docs, "text", "doc_id").select("doc_id", "clean")
    docs = docs.drop("text").join(clean_text, "doc_id").withColumnRenamed(
        "clean", "text"
    )
    leakage = {
        r["source"]: r["leak_micro"]
        for r in cross_source_leakage(docs).collect()
    }

    # 1. exact dedup
    docs = exact_dedup(docs, text_col="text", id_col="doc_id")
    n1 = docs.count()

    # 2. near-dup clustering → keep the min-id representative per cluster
    sig = minhash_signatures(docs, "text", "doc_id", num_hashes=8, shingle_n=2)
    pairs = minhash_band_pairs(sig, "doc_id", num_hashes=8, bands=4)
    clusters = dedup_clusters(pairs)  # (doc_id, cluster_rep) — only clustered docs
    docs = (
        docs.join(clusters, "doc_id", "left")
        .where(
            F.col("cluster_rep").isNull()
            | (F.col("cluster_rep") == F.col("doc_id"))
        )
        .drop("cluster_rep")
    )
    n2 = docs.count()

    # 3. quality gates (each signal is one scan / one bounded shuffle)
    from ontology_mapper_spark.operators.textstats import oov_stats

    rep = repetition_stats(docs, "text", "doc_id").select(
        "doc_id", "rep_micro"
    )
    nll = bigram_nll(docs, "text", "doc_id").select("doc_id", "nll_avg_micro")
    oov = oov_stats(docs, "text", "doc_id").select("doc_id", "oov_micro")
    scored = (
        with_quality_score(docs, "text")
        .join(rep, "doc_id", "left")
        .join(nll, "doc_id", "left")
        .join(oov, "doc_id", "left")
    )
    kept = scored.where(
        (F.col("quality_score") >= 40)
        & (F.coalesce(F.col("rep_micro"), F.lit(0)) <= 200_000)  # ≤20% top-bigram chars
        & (F.coalesce(F.col("oov_micro"), F.lit(0)) <= 900_000)  # tokenizer-shred guard
    )
    n3 = kept.count()

    # 4. benchmark decontamination: every 97th doc stands in for the
    # held-out eval set; docs sharing any 3-gram with it are dropped
    bench = kept.where(F.col("doc_id") % 97 == 0)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    clean = decontaminate(corpus, bench, "text", "doc_id", shingle_n=3)
    n4 = clean.count()

    # 5. per-language length outlier trim (p10-p90, exact rank rule)
    trimmed = percentile_trim(clean, "n_chars", by="lang", lower=0.1, upper=0.9)
    n5 = trimmed.count()

    # 6. corpus-model monitors: NB self-classification accuracy per
    # source (separability drift) + DSIR weights kept for sampling
    from ontology_mapper_spark.operators.classify import (
        dsir_weights,
        nb_label_scores,
    )

    nb = nb_label_scores(trimmed, "source", "text", "doc_id")
    nb_acc = {
        r["source"]: r["acc"]
        for r in nb.groupBy("source")
        .agg(F.avg(F.col("correct").cast("double")).alias("acc"))
        .collect()
    }
    target = min(nb_acc)  # deterministic example target domain
    dsir = dsir_weights(
        trimmed, target_label=target, label_col="source",
        text_col="text", id_col="doc_id",
    ).select("doc_id", "weight_micro")
    trimmed = trimmed.join(dsir, "doc_id", "left")

    # 7. deterministic split — stable under any partitioning / engine
    final = train_test_split(trimmed, "doc_id")
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    stats = {r["split"]: r["n"] for r in
             final.groupBy("split").agg(F.count("*").alias("n")).collect()}

    # 8. importance-weight sanity: the DSIR weight must rank its own
    # target domain above the rest (AUC well over 0.5) or stage 6 is
    # mis-specified
    from ontology_mapper_spark.operators.evaluate import roc_auc

    auc_row = roc_auc(
        final.select(
            F.lit("corpus").alias("g"),
            F.coalesce(F.col("weight_micro"), F.lit(0)).alias("w"),
            (F.col("source") == target).alias("y"),
        ),
        "g", "w", "y",
    ).collect()
    dsir_auc = auc_row[0]["auc_micro"] / 1e6 if auc_row else None

    # 9. release audit: re-identification risk of the published corpus
    from ontology_mapper_spark.operators.privacy import k_anonymity_report

    risk = {
        r["k"]: r
        for r in k_anonymity_report(
            final,
            ["source", F.floor(F.col("n_chars") / 100).cast("long")],
            "lang",
            (5,),
        ).collect()
    }
    k5 = risk[5]

    # 10. Neyman eval-budget allocation over the valid split
    from ontology_mapper_spark.operators.split import neyman_allocation

    alloc = {
        r["source"]: r["alloc_n"]
        for r in neyman_allocation(
            final.where(F.col("split") == "valid"), "source", "n_chars", 1000
        ).collect()
    }

    # 11. mixture allocation: the capstone — fill a 40%-of-corpus token
    # budget from the highest-quality sources first (quality here = mean
    # chars as the pluggable metric; swap in DSIR weight or NB margin)
    from ontology_mapper_spark.operators.mixing import mixture_allocation
    from ontology_mapper_spark.operators.textstats import words_col

    per_source = final.groupBy("source").agg(
        F.sum(F.size(words_col(F.col("text")))).cast("long").alias("n_tokens"),
        F.round(F.sum("n_chars") * F.lit(1_000_000) / F.count("*"))
        .cast("long")
        .alias("quality_micro"),
    )
    mix = {
        r["source"]: r["alloc_tokens"]
        for r in mixture_allocation(per_source).collect()
        if r["alloc_tokens"] > 0
    }

    # 12. ship gates: declarative data contract on the FINAL corpus
    # (one scan for all rules), PSI drift of the released length
    # distribution vs the raw drop, and the concentration panel that
    # says whether one source now dominates any language slice
    from ontology_mapper_spark.operators.dq import expectations_report
    from ontology_mapper_spark.operators.mixing import concentration_panel
    from ontology_mapper_spark.operators.stats import psi_drift

    contract = expectations_report(
        final,
        [
            {"rule_id": "c01", "column": "doc_id", "type": "not_null"},
            {"rule_id": "c02", "column": "doc_id", "type": "unique"},
            {"rule_id": "c03", "column": "text", "type": "not_null"},
            {"rule_id": "c04", "column": "n_chars", "type": "range",
             "lo": 1, "hi": 100000},
        ],
    )
    n_contract_fails = contract.where(F.col("ok") == 0).count()
    released = final.select("doc_id", "n_chars").withColumn("_cur", F.lit(1))
    rawdist = raw_docs.select("doc_id", "n_chars").withColumn(
        "_cur", F.lit(0)
    )
    psi_row = psi_drift(
        released.unionByName(rawdist), "n_chars", F.col("_cur") == 1,
        bin_width=100, n_bins=10,
    ).take(1)
    psi_level = psi_row[0]["drift_level"] if psi_row else None
    conc = concentration_panel(final, "lang", "source")
    max_hhi = conc.agg(F.max("hhi_micro").alias("m")).collect()[0]["m"]

    # 13. closing audit jobs — each is its own spark-submit entry with
    # its own SparkSession, so run them as subprocesses exactly the way
    # a cluster scheduler would chain them after the curation job.
    audit_summaries: dict[str, dict] = {}
    if os.environ.get("OMX_SKIP_AUDIT_JOBS") != "1":
        import json as _json
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for job in ("experiment_audit", "retention_audit"):
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(repo, "jobs", f"{job}.py"),
                    "--sf-dir",
                    sf_dir,
                    "--out",
                    os.path.join(out_dir + "_audits", job),
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            audit_summaries[job] = _json.loads(
                proc.stdout.strip().splitlines()[-1]
            )

    worst_leak = max(leakage.values()) if leakage else 0
    worst_acc = min(nb_acc.values()) if nb_acc else 1.0
    print(
        f"docs {n0} (worst source leak {worst_leak/1e4:.1f}%) "
        f"-> exact-dedup {n1} -> near-dup {n2} -> quality {n3} "
        f"-> decontaminated {n4} -> length-trimmed {n5} "
        f"(NB separability: worst source {worst_acc:.2f}, "
        f"DSIR target {target}, DSIR-AUC {dsir_auc}); "
        f"splits {stats}; "
        f"k=5 release risk {k5['rows_below']}/{k5['n_rows']} rows "
        f"(min l-diversity {k5['min_l_diversity']}); "
        f"eval alloc {alloc}; "
        f"mix ({len(mix)} sources funded) {mix}; "
        f"contract fails {n_contract_fails}, release-vs-raw PSI level "
        f"{psi_level}, max lang HHI {max_hhi}; wrote {out_dir}"
    )
    for job, s in audit_summaries.items():
        print(
            f"audit job {job}: {len(s.get('tables', {}))} report tables "
            f"written to {s.get('out', '?')}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
