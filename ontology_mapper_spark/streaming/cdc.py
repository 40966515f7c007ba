"""Streaming CDC: maintain a key-latest snapshot table from a change stream.

The batch half (`operators/cdc.py:apply_changes`) turns base + changelog
into the next snapshot with one window.  This module is the streaming
half: a `foreachBatch` sink that folds each micro-batch of change events
into a parquet snapshot table, with the three properties a long-running
maintainer needs at scale:

* **Order independence.** The snapshot stores the winning `_seq` per key
  and RETAINS delete tombstones, so merging is a pure max-by-seq fold —
  associative and commutative across any micro-batch split.  A late
  micro-batch carrying an older seq for a key can never overwrite a newer
  row or resurrect a deleted one; the final table equals the batch
  `apply_changes` over the complete log no matter how the stream chopped
  it.  (Without tombstones, "delete in batch 3, stale update in batch 7"
  would silently resurrect — the classic streaming-upsert bug.)
* **Exactly-once via a transactional manifest.** Each micro-batch writes
  a NEW generation directory `gen-<batch_id>` and then atomically swaps
  `_latest.json` (tmp + os.replace) to point at it; the manifest records
  `last_batch_id`, so Structured Streaming's replay-after-crash re-runs
  are detected and skipped (the Delta commit-log protocol reduced to one
  pointer file — Spark ignores `_`-prefixed files in table dirs).
  A crash between data write and manifest swap leaves the old generation
  live and the half-written one inert; the replay overwrites it.
* **Bounded state.** The only state is the snapshot itself (keys live
  exactly once) plus tombstones; `compact_snapshot` drops tombstones
  older than a seq horizon once every upstream producer has passed it,
  and `vacuum_snapshot` removes superseded generation dirs.

The merge itself is one hash shuffle on the key per micro-batch — at
100 TB the snapshot read+write dominates, which is inherent to
copy-on-write parquet maintenance; swapping `_write_generation` for a
`MERGE INTO` on a real lakehouse table keeps everything else unchanged.

Contract: `seq` is unique per key (a commit LSN / changelog offset).
Ties, should a producer violate that, break deterministically on op
(U > I > D lexicographically) so reruns stay reproducible.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANIFEST = "_latest.json"


def _read_manifest(snapshot_dir: str) -> dict | None:
    try:
        with open(os.path.join(snapshot_dir, _MANIFEST)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def _swap_manifest(snapshot_dir: str, manifest: dict) -> None:
    tmp = os.path.join(snapshot_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(snapshot_dir, _MANIFEST))


def _empty_versioned(
    spark: SparkSession, like: DataFrame, keys: list[str], payload: list[str]
) -> DataFrame:
    base_schema = like.select(*keys, *payload).schema
    fields = list(base_schema.fields) + [
        T.StructField("_seq", T.LongType()),
        T.StructField("_op", T.StringType()),
    ]
    return spark.createDataFrame([], T.StructType(fields))


def _merge_versioned(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    payload: list[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """max-by-seq fold of versioned base + raw changes; keeps tombstones."""
    chg = changes.select(
        *keys,
        *payload,
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(op_col).alias("_op"),
    )
    merged = base.select(*keys, *payload, "_seq", "_op").unionByName(chg)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_seq").desc(), F.col("_op").desc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*keys, *payload, "_seq", "_op")
    )


def _write_generation(df: DataFrame, snapshot_dir: str, label: str) -> str:
    path = os.path.join(snapshot_dir, f"gen-{label}")
    df.write.mode("overwrite").parquet(path)
    return path


def read_snapshot_versioned(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Current generation with `_seq`/`_op` columns (tombstones included)."""
    manifest = _read_manifest(snapshot_dir)
    if manifest is None:
        raise FileNotFoundError(f"no snapshot manifest under {snapshot_dir}")
    return spark.read.parquet(os.path.join(snapshot_dir, f"gen-{manifest['generation']}"))


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Live rows of the current generation (tombstones and version dropped)."""
    df = read_snapshot_versioned(spark, snapshot_dir)
    return df.where(F.col("_op") != "D").drop("_seq", "_op")


def cdc_snapshot_sink(
    snapshot_dir: str,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining `snapshot_dir` from change batches.

    Pass to ``changes.writeStream.foreachBatch(...)``.  Idempotent under
    micro-batch replay (manifest records last_batch_id); each batch costs
    one keyed window over snapshot ∪ batch and one generation write.
    """
    keys = list(key_cols)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        os.makedirs(snapshot_dir, exist_ok=True)
        manifest = _read_manifest(snapshot_dir)
        if manifest is not None and batch_id <= manifest["last_batch_id"]:
            return  # replay of an already-committed batch
        payload = (
            list(payload_cols)
            if payload_cols is not None
            else [c for c in batch_df.columns if c not in (*keys, seq_col, op_col)]
        )
        if manifest is None:
            base = _empty_versioned(spark, batch_df, keys, payload)
        else:
            base = spark.read.parquet(
                os.path.join(snapshot_dir, f"gen-{manifest['generation']}")
            )
        nxt = _merge_versioned(base, batch_df, keys, payload, seq_col, op_col)
        label = f"{batch_id:012d}"
        _write_generation(nxt, snapshot_dir, label)
        _swap_manifest(
            snapshot_dir, {"generation": label, "last_batch_id": batch_id}
        )

    return apply


def start_cdc_maintenance(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
):
    """Wire a change stream into the snapshot sink; caller starts/triggers.

    Returns the DataStreamWriter so the caller picks the trigger
    (`availableNow` for catch-up runs, processing-time for tailing).
    """
    return (
        changes.writeStream.foreachBatch(
            cdc_snapshot_sink(snapshot_dir, key_cols, seq_col, op_col)
        ).option("checkpointLocation", checkpoint_dir)
    )


def compact_snapshot(
    spark: SparkSession, snapshot_dir: str, tombstone_horizon_seq: int
) -> None:
    """Drop tombstones with `_seq` < horizon; write a new generation.

    Safe once every producer's replayable offset has passed the horizon
    (a change older than the horizon can never arrive again, so the
    tombstone has nothing left to block).  Live rows are untouched.
    """
    manifest = _read_manifest(snapshot_dir)
    if manifest is None:
        raise FileNotFoundError(f"no snapshot manifest under {snapshot_dir}")
    cur = read_snapshot_versioned(spark, snapshot_dir)
    kept = cur.where(
        (F.col("_op") != "D") | (F.col("_seq") >= tombstone_horizon_seq)
    )
    label = f"{manifest['generation']}c"
    _write_generation(kept, snapshot_dir, label)
    _swap_manifest(
        snapshot_dir,
        {"generation": label, "last_batch_id": manifest["last_batch_id"]},
    )


def vacuum_snapshot(snapshot_dir: str) -> list[str]:
    """Remove generation dirs other than the current one; returns removed."""
    manifest = _read_manifest(snapshot_dir)
    if manifest is None:
        return []
    keep = f"gen-{manifest['generation']}"
    removed = []
    for name in sorted(os.listdir(snapshot_dir)):
        if name.startswith("gen-") and name != keep:
            shutil.rmtree(os.path.join(snapshot_dir, name))
            removed.append(name)
    return removed
