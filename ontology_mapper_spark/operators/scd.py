"""Slowly-changing-dimension (type 2) history from periodic snapshots.

A KG rebuilt from successive ontology releases (or any dimension table
re-scraped per crawl) yields one full state per (entity, snapshot).
Downstream consumers want validity INTERVALS: when did this node's
attributes change, what is current.  This derives SCD2 rows with the
gaps-and-islands idiom:

    change flag (null-safe lag compare) → running-sum island id →
    per-island min/max snapshot → lead() for the exclusive end.

Everything is two windows + one groupBy over the SAME (entity) key, so
Spark plans a single hash exchange reused across all stages; state
comparison is null-safe (`<=>`), so null attribute values neither
break islands nor merge distinct ones.  No per-row Python.

Assumes a dense snapshot grid per entity (every entity present in
every snapshot it exists in consecutively); `valid_to` is the next
island's first snapshot, null for the open (current) island.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_snapshots(
    df: DataFrame,
    key_col: str,
    snap_col: str,
    state_cols: tuple[str, ...],
) -> DataFrame:
    """(key, state…, valid_from, valid_to, n_snaps, is_current) rows.

    ``valid_from`` = first snapshot of the island (inclusive),
    ``valid_to`` = first snapshot of the NEXT island (exclusive, null
    when the island is still current), ``n_snaps`` = island length.
    """
    state = F.struct(*[F.col(c) for c in state_cols])
    w = Window.partitionBy(key_col).orderBy(snap_col)
    flagged = df.select(
        key_col,
        snap_col,
        *state_cols,
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(state).over(w).eqNullSafe(state),
            1,
        )
        .otherwise(0)
        .alias("_chg"),
    )
    isl = flagged.withColumn("_island", F.sum("_chg").over(w))
    grp = isl.groupBy(key_col, "_island").agg(
        *[F.min(c).alias(c) for c in state_cols],  # constant within island
        F.min(snap_col).cast("long").alias("valid_from"),
        F.count("*").cast("long").alias("n_snaps"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    fin = grp.withColumn("valid_to", F.lead("valid_from").over(w2))
    return fin.select(
        key_col,
        *state_cols,
        "valid_from",
        "valid_to",
        "n_snaps",
        F.col("valid_to").isNull().alias("is_current"),
    )
