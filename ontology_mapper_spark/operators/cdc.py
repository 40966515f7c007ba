"""CDC changelog apply (MERGE INTO semantics, latest-wins upsert+delete).

Every long-lived KG / curation table is maintained as a base snapshot
plus a stream of change events (insert / update / delete, each with a
monotone sequence number).  Rebuilding the next snapshot is the
`MERGE INTO` of lakehouse engines (Delta/Iceberg); on plain parquet it
is exactly one window:

    union(base as op='B' @ seq=-1, changelog) →
    row_number() over (partition by key order by seq desc) = 1 →
    drop rows whose winning op is 'D'.

One hash shuffle on the key, map-side projection either side, no join
at all — strictly cheaper than the textbook full-outer-join MERGE and
identical in result because the window's total order picks the same
winner the join's COALESCE chain would.  At 100 TB the changelog is
normally ≪ base; AQE coalesces the union's post-shuffle partitions, and
the same plan serves compaction (base := apply_changes(base, log)).

Reference analogue: the cache-refresh overwrite semantics of
cache/manager.py (latest write wins per key) lifted to set-of-rows form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: changelog operation codes: insert/upsert, update, delete.
UPSERT_OPS = ("I", "U")
DELETE_OP = "D"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Next snapshot = base ⊕ changelog, latest change per key wins.

    ``changes`` must carry ``key_cols + [seq_col, op_col] + payload_cols``
    with ``op_col`` in {'I','U','D'} and ``seq_col`` unique per key (a
    commit LSN / event offset).  Base rows participate at seq = -1, so
    any change outranks them; keys whose winning op is 'D' disappear.
    Output schema = key_cols + payload_cols (base column order).
    """
    if payload_cols is None:
        payload_cols = [c for c in base.columns if c not in key_cols]
    keys = list(key_cols)
    payload = list(payload_cols)

    base_part = base.select(
        *keys,
        *payload,
        F.lit(-1).cast("long").alias("_seq"),
        F.lit("B").alias("_op"),
    )
    chg_part = changes.select(
        *keys,
        *payload,
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(op_col).alias("_op"),
    )
    merged = base_part.unionByName(chg_part)
    w = Window.partitionBy(*keys).orderBy(F.col("_seq").desc())
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(F.col("_op") != DELETE_OP)
    )
    return latest.select(*keys, *payload)
