"""Template / boilerplate detection over a document corpus.

Scraped and syndicated corpora are full of TEMPLATED documents: shared
license preambles, newsletter shells, auto-generated report frames.
Near-dup passes keyed on whole-document similarity miss them when the
variable middle dominates; the standard curation move is to fingerprint
the document EDGES — the first and the last ``edge_chars`` normalized
characters — and flag fingerprints that recur (Penedo et al. 2023
RefinedWeb §3.3 line-dedup rationale, applied at the document frame).

Head frames and tail frames are detected independently (a shared
preamble rarely implies a shared footer), so each doc contributes one
('head', fp) and one ('tail', fp) row; a single groupBy on (kind, fp)
then finds both families in one shuffle.  The fingerprint is the
shuffle key: ~uniform by construction, so the plan is one narrow hash
agg at any corpus size, and the count >= min_docs filter partial-aggs
map-side.  No Python, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text_col


def template_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = "source",
    edge_chars: int = 48,
    min_docs: int = 3,
) -> DataFrame:
    """Recurring head/tail frame groups of >= min_docs docs.

    Output per group: kind ('head'|'tail'), fp (md5 of the frame),
    n_docs, n_sources (1 when source_col is None — an intra-feed
    template), rep_doc_id (min id, deterministic exemplar), and
    avg_chars_micro of the members' normalized length (integer sum,
    one division).
    """
    normed = df.select(
        F.col(id_col).alias("_id"),
        (F.col(source_col) if source_col else F.lit("all")).alias("_src"),
        normalized_text_col(F.col(text_col)).alias("_norm"),
    )
    # tail via explicit positive start — negative-start substring
    # semantics differ across engines on short strings
    tail_start = F.greatest(
        F.length("_norm") - F.lit(edge_chars - 1), F.lit(1)
    )
    fps = normed.select(
        "_id",
        "_src",
        F.length("_norm").cast("long").alias("_len"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("head").alias("kind"),
                    F.md5(F.substring(F.col("_norm"), 1, edge_chars)).alias("fp"),
                ),
                F.struct(
                    F.lit("tail").alias("kind"),
                    F.md5(
                        F.substring(F.col("_norm"), tail_start, F.lit(edge_chars))
                    ).alias("fp"),
                ),
            )
        ).alias("_e"),
    ).select("_id", "_src", "_len", F.col("_e.kind").alias("kind"), F.col("_e.fp").alias("fp"))
    grp = fps.groupBy("kind", "fp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("_src").cast("long").alias("n_sources"),
        F.min("_id").alias("rep_doc_id"),
        F.sum("_len").cast("long").alias("_sum_len"),
    )
    return (
        grp.where(F.col("n_docs") >= min_docs)
        .select(
            "kind",
            "fp",
            "n_docs",
            "n_sources",
            "rep_doc_id",
            F.round(F.col("_sum_len") / F.col("n_docs") * 1e6)
            .cast("long")
            .alias("avg_chars_micro"),
        )
    )
