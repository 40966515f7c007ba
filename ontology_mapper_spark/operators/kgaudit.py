"""KG-quality audits over triple tables and the link decision table.

The reference emits (subj, pred, obj) mappings and per-term candidate
lists but has no corpus-level quality view of either (its report is a
flat JSON dump, core/generator.py:328-338).  These operators are the
audits a KG build actually runs before canonicalization:

* `predicate_cardinality` — per-predicate functionality profile.  An
  (almost-)functional predicate (every subject has one object) is safe
  to collapse during canonicalization; a high fan-out predicate is a
  hub-risk signal for the CC stage's skew handling
  (pipeline/canonicalize.py hot_degree_threshold).
* `link_margins` — per-pattern linker-confidence margins from the
  rank_dictionary decision table: the score gap between the rank-1 and
  rank-2 candidate is the standard "is this link safe to auto-accept"
  signal (small margin = ambiguous pattern, route to review).

Scale shape: predicate_cardinality is two keyed aggregates over the
triple table (distinct-first, map-side combinable) joined on the
predicate dimension; link_margins runs entirely over the
dictionary-sized decision table (the same table the per-turn path
broadcasts — ~1e3 rows by construction, see link_score.rank_dictionary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def predicate_cardinality(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-predicate cardinality/functionality profile of a triple set.

    Output per predicate: pred, n_triples (distinct S-P-O), n_subj,
    n_obj, n_subj_functional (subjects with exactly ONE distinct
    object), functionality_micro (n_subj_functional/n_subj),
    fanout_micro (n_triples/n_subj), inv_fanout_micro (n_triples/n_obj).
    Each ratio is ONE micro-rounded integer division.
    """
    t = triples.select(
        F.col(subj_col).alias("_s"),
        F.col(pred_col).alias("_p"),
        F.col(obj_col).alias("_o"),
    ).distinct()
    per_subj = t.groupBy("_p", "_s").agg(
        F.count("*").cast("long").alias("_k")
    )
    subj_prof = per_subj.groupBy("_p").agg(
        F.count("*").cast("long").alias("n_subj"),
        F.sum("_k").cast("long").alias("n_triples"),
        F.sum(F.when(F.col("_k") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_subj_functional"),
    )
    obj_prof = t.groupBy("_p").agg(
        F.countDistinct("_o").cast("long").alias("n_obj")
    )
    return (
        subj_prof.join(obj_prof, "_p")
        .select(
            F.col("_p").alias("pred"),
            "n_triples",
            "n_subj",
            "n_obj",
            "n_subj_functional",
            F.round(F.col("n_subj_functional") * MICRO / F.col("n_subj"))
            .cast("long")
            .alias("functionality_micro"),
            F.round(F.col("n_triples") * MICRO / F.col("n_subj"))
            .cast("long")
            .alias("fanout_micro"),
            F.round(F.col("n_triples") * MICRO / F.col("n_obj"))
            .cast("long")
            .alias("inv_fanout_micro"),
        )
    )


def link_margins(
    decision_table: DataFrame,
    ambiguity_threshold_micro: int = 50_000,
) -> DataFrame:
    """Per-pattern linker-confidence margins from a rank_dictionary
    decision table (columns pattern, rank, score, class_iri).

    Output per pattern: pattern, n_cands (candidates kept by the top-k
    rank), top_class_iri, top_score_micro, margin_micro (top1 - top2
    score, NULL for single-candidate patterns), ambiguous (margin
    defined and < threshold).  Scores go through the SAME
    round(score*1e6) the kg fixture oracles pin down, so the margin is
    a difference of two already-rounded int64s — exact.
    """
    scored = decision_table.select(
        "pattern",
        "rank",
        "class_iri",
        F.round(F.col("score") * MICRO).cast("long").alias("_sm"),
    )
    per = scored.groupBy("pattern").agg(
        F.count("*").cast("long").alias("n_cands"),
        F.max(F.when(F.col("rank") == 1, F.col("class_iri"))).alias(
            "top_class_iri"
        ),
        F.max(F.when(F.col("rank") == 1, F.col("_sm")))
        .cast("long")
        .alias("top_score_micro"),
        F.max(F.when(F.col("rank") == 2, F.col("_sm")))
        .cast("long")
        .alias("_second_micro"),
    )
    margin = F.col("top_score_micro") - F.col("_second_micro")
    return per.select(
        "pattern",
        "n_cands",
        "top_class_iri",
        "top_score_micro",
        margin.alias("margin_micro"),
        F.coalesce(
            margin < int(ambiguity_threshold_micro), F.lit(False)
        ).alias("ambiguous"),
    )
