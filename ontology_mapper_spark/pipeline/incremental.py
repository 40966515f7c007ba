"""Bucket-granular incremental mention detection.

Stage-level resume (runner.py) skips a whole stage only when NOTHING
changed. At 10^12 turns the realistic case is a trickle: new conversations
land in a few conv_id hash buckets per batch. This module recomputes ONLY
those buckets:

1. per-bucket input fingerprints = sum of xxhash64(conv_id, turn_idx,
   text) per bucket (order-independent, distributed, one map-side agg);
2. compare against the fingerprints recorded at last run;
3. re-run detection on changed buckets only and overwrite exactly those
   partitions (`partitionOverwriteMode=dynamic` — untouched bucket
   directories stay as-is, so the write cost is proportional to the
   delta, not the corpus).

This composes with stage fingerprints: the stage marker stores the
per-bucket map instead of one hash.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_MARKER = "_BUCKET_FINGERPRINTS.json"


def bucket_fingerprints(transcripts: DataFrame, buckets: int = 32) -> dict[str, int]:
    """{bucket: order-independent content hash} over (conv_id, turn_idx, text)."""
    rows = (
        transcripts.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets))
        )
        .groupBy("bucket")
        .agg(
            F.sum(
                F.xxhash64("conv_id", "turn_idx", "text").cast("decimal(38,0)")
            ).alias("fp")
        )
        .collect()
    )
    return {str(r["bucket"]): int(r["fp"]) for r in rows}


def _load_marker(path: str) -> dict[str, int]:
    try:
        with open(os.path.join(path, BUCKET_MARKER)) as fh:
            return {k: int(v) for k, v in json.load(fh).items()}
    except (OSError, json.JSONDecodeError):
        return {}


def _save_marker(path: str, fps: dict[str, int]) -> None:
    with open(os.path.join(path, BUCKET_MARKER), "w") as fh:
        json.dump(fps, fh)


def incremental_detect(
    spark: SparkSession,
    transcripts: DataFrame,
    patterns: list[str],
    out_path: str,
    buckets: int = 32,
) -> dict:
    """Detect mentions for changed buckets only; returns
    {'changed_buckets': [...], 'n_buckets': N, 'rows_written': int}.

    Output layout: parquet partitioned by `bucket`; only changed bucket
    partitions are overwritten (dynamic partition overwrite).
    """
    from .mention_detect import detect_mentions

    current = bucket_fingerprints(transcripts, buckets)
    previous = _load_marker(out_path) if os.path.exists(out_path) else {}
    changed = sorted(
        int(b) for b in current if previous.get(b) != current[b]
    )
    # buckets that vanished entirely are stale leftovers → treat as changed
    removed = sorted(int(b) for b in previous if b not in current)

    result = {
        "n_buckets": len(current),
        "changed_buckets": changed,
        "removed_buckets": removed,
        "rows_written": 0,
    }
    if not changed and not removed:
        return result

    delta = transcripts.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets))
    ).where(F.col("bucket").isin(changed))
    mentions = detect_mentions(
        spark, delta.select("conv_id", "turn_idx", "text"), patterns
    ).withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)))

    # Dynamic partition overwrite only replaces partitions PRESENT in the
    # new write. A changed bucket whose recomputation yields zero rows
    # would otherwise keep its stale directory forever — so drop every
    # changed/removed bucket dir up front; the write then restores exactly
    # the non-empty ones.
    import shutil

    for b in changed + removed:
        shutil.rmtree(os.path.join(out_path, f"bucket={b}"), ignore_errors=True)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        mentions.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    _save_marker(out_path, current)
    # an all-buckets-empty write leaves no parquet files to infer a schema
    # from — only count when at least one bucket directory exists
    has_data = any(d.startswith("bucket=") for d in os.listdir(out_path))
    result["rows_written"] = (
        spark.read.parquet(out_path).where(F.col("bucket").isin(changed)).count()
        if changed and has_data
        else 0
    )
    return result


def _mention_bucket_fps(mentions: DataFrame) -> dict[str, int]:
    rows = (
        mentions.groupBy("bucket")
        .agg(
            F.sum(
                F.xxhash64(
                    "conv_id", "turn_idx", "begin", "end", "pattern"
                ).cast("decimal(38,0)")
            ).alias("fp")
        )
        .collect()
    )
    return {str(r["bucket"]): int(r["fp"]) for r in rows}


def incremental_link(
    spark: SparkSession,
    mentions_path: str,
    terms: DataFrame,
    out_path: str,
    dict_version: str = "v1",
) -> dict:
    """Link only mention buckets that changed since the last link run
    (or all, when the dictionary version changes — a new snapshot
    invalidates every bucket).

    Same delta-proportional pattern as incremental_detect: per-bucket
    fingerprints gate work; dynamic partition overwrite rewrites only the
    recomputed bucket directories. The link itself stays the broadcast
    decision-table join (zero shuffle). The mentions' own `bucket` column
    is preserved verbatim — never recomputed — so partition alignment
    with the detect stage is structural.
    """
    import hashlib

    from .link_score import rank_dictionary

    # stable across processes (python's hash() is salted per run)
    version_fp = int(hashlib.sha256(dict_version.encode()).hexdigest()[:12], 16)

    # an all-empty detect output has no parquet files at all — treat as an
    # empty mention set instead of failing schema inference
    if any(d.startswith("bucket=") for d in os.listdir(mentions_path)):
        mentions = spark.read.parquet(mentions_path)
        current = _mention_bucket_fps(mentions)
    else:
        mentions = None
        current = {}
    marker = _load_marker(out_path) if os.path.exists(out_path) else {}
    prev_version = marker.pop("__dict_version__", None)
    if prev_version is not None and prev_version != version_fp:
        marker = {}  # dictionary changed → everything is stale
    changed = sorted(int(b) for b in current if marker.get(b) != current[b])
    removed = sorted(int(b) for b in marker if b not in current)

    result = {
        "n_buckets": len(current),
        "changed_buckets": changed,
        "removed_buckets": removed,
    }
    if not changed and not removed:
        return result

    # Same stale-partition guard as incremental_detect: a changed bucket
    # that links to zero rows must lose its old directory.
    import shutil

    os.makedirs(out_path, exist_ok=True)
    for b in changed + removed:
        shutil.rmtree(os.path.join(out_path, f"bucket={b}"), ignore_errors=True)

    if changed:
        ranked = F.broadcast(rank_dictionary(spark, terms, idf=None))
        links = mentions.where(F.col("bucket").isin(changed)).join(
            ranked, "pattern", "inner"
        )
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            links.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    _save_marker(out_path, {**current, "__dict_version__": version_fp})
    return result
