"""Cross-turn co-mention edges (SURVEY.md J8 — new, north_star).

Two entities co-mentioned within a window of W turns in the same
conversation get an undirected edge (entity_a < entity_b) with a count.

Implementation choice (scale): a `Window.partitionBy(conv_id)
.orderBy(turn_idx).rowsBetween(0, W)` + collect_list + explode would
materialize O(turns×W) intermediate arrays; instead we reduce FIRST to the
distinct (conv_id, turn_idx, entity) set — orders of magnitude smaller than
mentions — and self-join on conv_id with a turn-range predicate. AQE handles
residual skew; both sides are pre-aggregated so the join input is minimal.
One shuffle on conv_id (both sides), which co-partitions the join; the
final groupBy(a, b) is the unavoidable edge aggregation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def comention_edges(links: DataFrame, window_turns: int = 2,
                    entity_col: str = "class_iri") -> DataFrame:
    """(entity_a, entity_b, n_comentions) for pairs within `window_turns`."""
    ments = (
        links.select("conv_id", "turn_idx", F.col(entity_col).alias("entity"))
        .distinct()
    )
    a = ments.alias("a")
    b = ments.alias("b")
    # Symmetric window: the lexicographically smaller entity may be
    # mentioned EITHER side of the other within W turns. a.entity <
    # b.entity still counts each unordered mention-event pair exactly once
    # (a is pinned to the smaller entity, b to the larger).
    pairs = (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("b.turn_idx") >= F.col("a.turn_idx") - window_turns)
            & (F.col("b.turn_idx") <= F.col("a.turn_idx") + window_turns)
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .select(
            F.col("a.entity").alias("entity_a"),
            F.col("b.entity").alias("entity_b"),
        )
    )
    return pairs.groupBy("entity_a", "entity_b").agg(
        F.count("*").alias("n_comentions")
    )
