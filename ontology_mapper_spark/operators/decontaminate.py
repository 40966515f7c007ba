"""Benchmark decontamination for training corpora.

Before training, every serious data pipeline screens the corpus against
the evaluation benchmarks: any document sharing a long-enough word n-gram
with a benchmark item is flagged (and usually dropped), because verbatim
benchmark leakage inflates downstream scores. This is the n-gram-overlap
decontamination used by GPT-3 (Brown et al. 2020, appendix C: 13-gram
collision), PaLM, and Llama; the reference engine has no training-data
surface at all, so this is part of the LLM-pipeline operator family the
build plan adds (SURVEY.md §build, "training-data pipeline ops").

Spark shape — an inverted-index SEMI join, never all-pairs:

* benchmark shingles are DISTINCT n-grams of the (small) benchmark set;
* corpus docs explode to distinct shingles once, then a semi-join (for
  flagging) or an inner join + count (for the overlap report) on the
  shingle key;
* the shingle key join is quadratic in per-shingle document frequency,
  so the same composed stop-shingle caps as ngram_jaccard_pairs apply
  when benchmark items contain boilerplate; at n ≥ 5 real-world grams
  are near-unique and the join is effectively linear.

Everything is exact integer/string work — reproducible verbatim in the
DuckDB oracle (same normalize + split + lead-chain n-grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """(doc_id, n_overlap) — corpus docs sharing ≥ `min_overlap` DISTINCT
    word n-grams with ANY benchmark item, with the count of distinct
    shared shingles (the triage signal: 1 shared 3-gram is noise, 40 is a
    verbatim copy). Corpus docs that are themselves benchmark rows are
    the caller's concern (pass an anti-joined corpus to exclude them).
    """
    bench_sh = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
        )
        .distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col),
        F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh"),
    )
    return (
        corpus_sh.join(bench_sh, "sh", "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """The corpus MINUS contaminated docs — a left-anti semi-structure on
    the shingle inverted index: cheapest form when only the clean corpus
    is wanted (no counting; the join can short-circuit per doc)."""
    bench_sh = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh")
        )
        .distinct()
    )
    dirty = (
        corpus.select(
            F.col(id_col),
            F.explode(shingles_col(F.col(text_col), shingle_n)).alias("sh"),
        )
        .join(bench_sh, "sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(dirty, id_col, "left_anti")
