"""Deterministic dedup / top-k operators (D2, T2 — SURVEY.md §2.5-2.6).

The reference's first-seen-wins URI dedup (core/lookup.py:68-87) depends on
Python list order; `dropDuplicates` would be partition-order-dependent, so
both operators here are window ranks with explicit total orderings —
identical output under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def priority_dedup(
    df: DataFrame,
    key_cols: list[str],
    priority: Column,
    tiebreak_cols: list[str],
) -> DataFrame:
    """Keep one row per key, lowest `priority` first, then tiebreaks.

    Reference analogue: BP-before-OLS union where the first row per URI
    wins (core/lookup.py:68-87). priority = source rank expression.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        priority, *[F.col(c) for c in tiebreak_cols]
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") == 1)
        .drop("_rank")
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group (T2: per-concept top-k results). order_cols must
    be a total order for determinism — include a unique id last."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
