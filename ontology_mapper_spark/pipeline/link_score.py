"""Stage 2 — entity-link scoring: mention → ontology-class candidates.

Candidate generation is an equi-join of detected mentions against the
exploded (pattern → term) dictionary — the dictionary side is small by
design and explicitly ``broadcast()``, so at 10^12-turn scale this stage is
a map-side join with NO shuffle of the mention table.

Scoring reproduces the reference's two-layer semantics:

1. the *class* decision — ``determine_alignment_type``
   (/root/reference/utils/helpers.py:76-105) — runs as the native
   when/otherwise chain in functions/align.py (JVM-side, codegen);
2. a *numeric* rescore (Jaro-Winkler on normalized strings + TF-IDF cosine
   over dictionary tokens) runs as an Arrow-vectorized pandas UDF — the
   only Python in the stage, and batch-wise, never per-row-over-Spark
   (BASELINE.json:input_hint forbids per-row Python UDFs).

Priority dedup (same URI from both service sources: bioportal wins, OLS
survivor flagged ols_only) mirrors core/lookup.py:68-87 as a deterministic
window rank — not dropDuplicates, whose winner is partition-order-dependent.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.align import alignment_predicate_col, alignment_type_col


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity in [0,1] (public textbook algorithm), using
    the standard production conventions — mismatched positions integer-
    halved into transpositions, and the Winkler prefix boost applied only
    above the classic 0.7 threshold — so the result is bit-identical to
    independent implementations (DuckDB's jaro_winkler_similarity,
    RapidFuzz); parity is property-tested in tests/test_kg_fixture_oracle.py."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    mismatched = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                mismatched += 1
            k += 1
    transpositions = mismatched // 2
    jaro = (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


def _tfidf_cosine(tokens_a: list[str], tokens_b: list[str], idf: dict[str, float]) -> float:
    """Cosine of IDF-weighted token multisets (df from the dictionary side)."""
    if not tokens_a or not tokens_b:
        return 0.0
    wa: dict[str, float] = {}
    wb: dict[str, float] = {}
    for t in tokens_a:
        wa[t] = wa.get(t, 0.0) + idf.get(t, 1.0)
    for t in tokens_b:
        wb[t] = wb.get(t, 0.0) + idf.get(t, 1.0)
    dot = sum(wa[t] * wb[t] for t in wa.keys() & wb.keys())
    na = math.sqrt(sum(v * v for v in wa.values()))
    nb = math.sqrt(sum(v * v for v in wb.values()))
    return dot / (na * nb) if na and nb else 0.0


def dictionary_idf(terms_df: DataFrame) -> dict[str, float]:
    """IDF over label tokens of the term dictionary (small; driver-collected)."""
    df = (
        terms_df.select(F.explode(F.split(F.lower(F.trim("label")), r"\s+")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    n = max(terms_df.count(), 1)
    return {
        r["tok"]: math.log((1 + n) / (1 + r["df"])) + 1.0 for r in df.collect()
    }


def term_patterns(terms_df: DataFrame) -> DataFrame:
    """Explode the dictionary to (pattern, term_id, class_iri, ontology,
    label, synonyms, source, match_via). Pattern normalization = the
    comparator's lower().strip() (services/comparator.py:27-28); synonym
    quality filter = utils/helpers.py:58-60 (≥3 chars, non-blank)."""
    base_cols = ["term_id", "class_iri", "ontology", "label", "synonyms", "source"]
    labels = terms_df.select(
        F.lower(F.trim("label")).alias("pattern"), *base_cols
    ).withColumn("match_via", F.lit("label"))
    syns = (
        terms_df.select(F.explode("synonyms").alias("syn"), *base_cols)
        .select(F.lower(F.trim("syn")).alias("pattern"), *base_cols)
        .where(F.length("pattern") >= 3)
        .withColumn("match_via", F.lit("synonym"))
    )
    return labels.unionByName(syns).dropDuplicates(["pattern", "term_id", "source", "match_via"])


def score_candidates(
    spark: SparkSession,
    candidates: DataFrame,
    idf: dict[str, float],
    surface_col: str = "pattern",
    label_col: str = "label",
) -> DataFrame:
    """Append a numeric `score` column: 0.7·JaroWinkler + 0.3·TFIDF-cosine,
    computed in one Arrow-vectorized pandas UDF over (surface, label)."""
    bc_idf = spark.sparkContext.broadcast(idf)

    @F.pandas_udf(T.DoubleType())
    def pair_score(surface: pd.Series, label: pd.Series) -> pd.Series:
        idf_map = bc_idf.value
        out = []
        for s, l in zip(surface.tolist(), label.tolist()):
            s_n = (s or "").lower().strip()
            l_n = (l or "").lower().strip()
            jw = jaro_winkler(s_n, l_n)
            cos = _tfidf_cosine(s_n.split(), l_n.split(), idf_map)
            out.append(0.7 * jw + 0.3 * cos)
        return pd.Series(out)

    return candidates.withColumn("score", pair_score(F.col(surface_col), F.col(label_col)))


def rank_dictionary(
    spark: SparkSession,
    terms_df: DataFrame,
    idf: dict[str, float] | None = None,
    top_k: int = 3,
) -> DataFrame:
    """Precomputed per-pattern decision table: classification, score,
    URI-priority dedup, and top-k rank for every dictionary pattern.

    THE scale insight of this stage: every per-candidate decision the
    reference makes — determine_alignment_type (utils/helpers.py:76-105),
    URI-priority dedup (core/lookup.py:68-87), score-ranked top-k
    (core/lookup.py:63-66) — is a pure function of (pattern, term), never
    of the individual mention (a matched span lowercased IS its pattern).
    So all of it runs once over the dictionary-sized pattern table (window
    functions and the Arrow-batched scorer touch ~1e3 rows), and the
    10^12-turn mention table only ever sees a broadcast hash join: zero
    shuffles, zero Python in the per-turn path.
    """
    cand = term_patterns(terms_df)
    cand = cand.withColumn("concept_key", F.translate("pattern", " ", "_"))
    cand = cand.withColumn(
        "alignment",
        alignment_type_col(F.col("label"), F.col("synonyms"), F.col("concept_key")),
    ).withColumn(
        "predicate",
        alignment_predicate_col(F.col("label"), F.col("synonyms"), F.col("concept_key")),
    )
    cand = score_candidates(spark, cand, idf or {})

    # URI-priority dedup per (pattern, class): bioportal wins over OLS,
    # then stable tiebreaks (core/lookup.py:68-87 first-seen semantics).
    w_uri = Window.partitionBy("pattern", "class_iri").orderBy(
        F.when(F.col("source") == "bioportal", 0).otherwise(1),
        F.col("term_id"),
        F.col("match_via"),
    )
    deduped = (
        cand.withColumn("_r", F.row_number().over(w_uri))
        .where(F.col("_r") == 1)
        .drop("_r")
        .withColumn("ols_only", F.col("source") == "ols")
    )
    w_rank = Window.partitionBy("pattern").orderBy(
        F.col("score").desc(), F.col("class_iri")
    )
    return (
        deduped.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= top_k)
    )


def link_mentions(
    spark: SparkSession,
    mentions: DataFrame,
    terms_df: DataFrame,
    idf: dict[str, float] | None = None,
    top_k: int = 3,
) -> DataFrame:
    """mentions × dictionary → scored, classified, deduped links.

    One broadcast hash join against the precomputed `rank_dictionary`
    decision table — map-only over the mention table (see rank_dictionary
    docstring for why this is exact, not an approximation).

    Output: (conv_id, turn_idx, begin, end, surface, pattern, term_id,
    class_iri, ontology, label, synonyms, source, match_via, concept_key,
    alignment, predicate, score, ols_only, rank).
    """
    ranked = rank_dictionary(spark, terms_df, idf, top_k)
    return mentions.join(F.broadcast(ranked), "pattern", "inner")
