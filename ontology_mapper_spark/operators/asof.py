"""As-of (most-recent-event) join — a custom operator Spark's DataFrame
API lacks (SURVEY.md §2.3 notes the reference has none either; training
pipelines need it to attach the latest state snapshot to each event).

Semantics: for each left row, the single right row with the same key and
the LARGEST right timestamp ≤ the left timestamp (backward as-of).

Implementation is the union-and-carry pattern — composition of existing
DataFrame ops, no UDF (preferred path per the custom-operator ladder):
tag both sides, union, sort per key by (ts, side-order), carry the last
seen right attributes forward with `last(ignorenulls)` over an unbounded
preceding window, keep left rows. One shuffle on the key — the same cost
as any co-partitioned join; no range explosion, no per-row Python.

Ties: a right row AT the left timestamp matches (≤), which the side-order
tiebreak (right sorts before left at equal ts) implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """left columns + right `value_cols` (renamed `asof_<col>`) + asof_ts."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        *[F.col(c) for c in left.columns if c not in (on,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on,)],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # (_ts, _side) alone is not a total order when several right rows share
    # a key+timestamp — last(ignorenulls) would then be partition-order
    # dependent. Appending the right value columns (+ right ts) makes ties
    # resolve identically under any parallelism: the max-by-value right row
    # wins deterministically.
    w = (
        Window.partitionBy(on)
        .orderBy(
            "_ts",
            "_side",
            *[F.col(f"_r_{c}") for c in value_cols],
            "_r_ts",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    keep = [on] + [c for c in left.columns if c != on] + [
        f"asof_{c}" for c in value_cols
    ] + ["asof_ts"]
    return carried.where(F.col("_side") == 1).select(*keep)
