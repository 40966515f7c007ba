"""Table catalog: load the driver's parquet tables and register views.

At sandbox scale these are plain parquet files; at cluster scale the same
names would be Iceberg tables — the loader is the only code that knows the
difference (SURVEY.md §7.1 step 7 fallback).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_all(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


# ---------------------------------------------------------------------------
# Iceberg-like table writes (SURVEY.md §7.1 step 7 parquet fallback)
# ---------------------------------------------------------------------------
#
# No Iceberg runtime jar is resolvable offline in this sandbox, so tables
# are parquet directories in an Iceberg-like layout: data files under the
# table path (optionally hive-partitioned) plus a `_manifest.json` recording
# schema, partition spec, snapshot id, and row count. On a real cluster the
# writer below is the ONLY code to swap for `df.writeTo(name).using
# ("iceberg")` — readers go through load_table/snapshot metadata the same
# way.


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    snapshot_id: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write parquet + manifest.json; returns the manifest dict."""
    import hashlib
    import json

    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    back = df.sparkSession.read.parquet(path)
    manifest = {
        "format_version": "parquet-manifest-1",
        "schema": back.schema.jsonValue(),
        "partition_spec": partition_by or [],
        "snapshot_id": snapshot_id
        or hashlib.sha256(back.schema.simpleString().encode()).hexdigest()[:16],
        "row_count": back.count(),
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_manifest(path: str) -> dict | None:
    import json

    try:
        with open(os.path.join(path, "_manifest.json")) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
