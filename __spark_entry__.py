"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ontology_mapper_spark.contract`` (one
(spark_callable, duckdb_sql) pair per SURVEY.md §2 operator); this file
stays a thin adapter so the package is the single source of truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Aho-Corasick mention
    detection (broadcast automaton, mapInPandas) over `documents`, linked
    into per-pattern mention stats + same-doc co-mention degree."""
    from ontology_mapper_spark.contract import _DEMO_PATTERNS
    from ontology_mapper_spark.pipeline.comention import comention_edges
    from ontology_mapper_spark.pipeline.mention_detect import detect_mentions

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
    )
    mentions = detect_mentions(spark, docs, _DEMO_PATTERNS)
    stats = mentions.groupBy("pattern").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("conv_id").alias("n_docs"),
    )
    co = comention_edges(mentions, window_turns=0, entity_col="pattern")
    degree = (
        co.select(F.col("entity_a").alias("pattern"), "n_comentions")
        .unionByName(co.select(F.col("entity_b").alias("pattern"), "n_comentions"))
        .groupBy("pattern")
        .agg(F.sum("n_comentions").alias("comention_degree"))
    )
    return stats.join(degree, "pattern", "left").orderBy("pattern")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data ops); see ontology_mapper_spark/contract.py."""
    from ontology_mapper_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — since round 2, EVERY
    queries() entry has one (the approximate/hash-specific ops use
    engine-portable md5-derived constructions; the KG pipeline uses the
    kg_fixture decision-table/BFS mirrors)."""
    from ontology_mapper_spark.contract import ORACLES

    return dict(ORACLES)
