"""Data-quality audits: referential integrity + column profiling.

The warehouse-hygiene pair every ingest pipeline runs before anything
downstream trusts the tables.  Both are pure aggregate shapes:

* `referential_integrity` — per declared FK relation, the child row
  count and the orphan count (child keys with no matching parent) via a
  left-anti join on the key.  At 100 TB each relation is one shuffled
  (or AQE-broadcast, when the parent is dimension-sized) join + one
  count; relations are independent so the driver unions seven tiny
  1-row aggregates.
* `profile_columns` — one row per declared column with null count,
  exact distinct count, and lexicographic min/max of the STRING
  rendering (the documented contract: a profile row must be one stable
  type across heterogeneous columns, so everything is rendered
  `CAST(col AS STRING)` first; numeric min/max belong to per-column
  stats, not the profile).  Implemented as an unpivot (stack) into
  (column, value) rows + ONE hash aggregate — a single scan of the
  table regardless of column count, map-side partial aggregation, no
  per-column jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def referential_integrity(
    relations: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """FK-integrity audit over declared (name, child_df, child_key,
    parent_df, parent_key) relations.

    NULL child keys are counted separately (`n_null_keys`) and are NOT
    orphans — SQL FK semantics, where a null FK is 'not participating'.
    Output: (relation, n_child, n_null_keys, n_orphans,
    orphan_micro) with orphan_micro = orphans/(non-null children) in
    micro-units (single division per 1-row relation aggregate).
    """
    parts = []
    for name, child, ckey, parent, pkey in relations:
        keys = child.select(F.col(ckey).alias("_k"))
        pk = parent.select(F.col(pkey).alias("_k")).distinct()
        orphans = keys.where(F.col("_k").isNotNull()).join(
            pk, "_k", "left_anti"
        )
        base = keys.agg(
            F.count("*").cast("long").alias("n_child"),
            F.sum(F.col("_k").isNull().cast("long"))
            .cast("long")
            .alias("n_null_keys"),
        )
        orc = orphans.agg(F.count("*").cast("long").alias("n_orphans"))
        parts.append(
            base.join(orc)  # 1-row × 1-row
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_keys",
                "n_orphans",
                F.when(
                    F.col("n_child") > F.col("n_null_keys"),
                    F.round(
                        F.col("n_orphans")
                        * F.lit(MICRO)
                        / (F.col("n_child") - F.col("n_null_keys"))
                    ).cast("long"),
                ).alias("orphan_micro"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_columns(
    df: DataFrame, columns: Sequence[str]
) -> DataFrame:
    """Single-scan column profile: one output row per declared column.

    Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str)
    where min/max/distinct are over the STRING rendering (see module
    docstring) and n_distinct EXCLUDES null (SQL count-distinct
    semantics, mirrored by the oracle).
    """
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    long_form = df.select(
        F.expr(
            f"stack({len(columns)}, {pairs}) AS (_col, _val)"
        )
    )
    return long_form.groupBy(F.col("_col").alias("column")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("_val").isNull().cast("long"))
        .cast("long")
        .alias("n_nulls"),
        F.countDistinct("_val").cast("long").alias("n_distinct"),
        F.min("_val").alias("min_str"),
        F.max("_val").alias("max_str"),
    )
