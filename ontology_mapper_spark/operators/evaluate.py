"""Retrieval-quality evaluation operators.

An ANN index (operators/similarity.py) is only as good as its measured
recall; a 100 TB pipeline runs that measurement as a first-class
distributed job (sampled queries, exact top-k vs index top-k), not as a
notebook afterthought. tests/test_ann_recall.py proves the recall bounds
in-process; `topk_recall` is the same computation as a DataFrame operator
so it can run at corpus scale and land in the metrics table
(pipeline/runner.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result set against the
    exact top-k: |approx ∩ exact| / |exact|, in integer micro units.

    Both inputs are (query, id, ...) top-k tables — k rows per query.
    The intersection is ONE equi-join on (query, id); per-query counts
    are integer, recall has one terminal division. Queries are the
    sampled evaluation set, so both sides are small relative to the
    corpus — but nothing here collects, so a full-corpus self-recall
    run is just a bigger join.

    Output: (query, k_exact, n_hit, recall_micro).
    """
    ex = exact.select(F.col(query_col), F.col(id_col))
    ap = approx.select(
        F.col(query_col), F.col(id_col), F.lit(1).alias("_hit")
    )
    joined = ex.join(ap, [query_col, id_col], "left")
    per = joined.groupBy(query_col).agg(
        F.count("*").cast("long").alias("k_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
    )
    return per.select(
        query_col,
        "k_exact",
        "n_hit",
        F.round((F.col("n_hit") * MICRO).cast("double") / F.col("k_exact"))
        .cast("long")
        .alias("recall_micro"),
    )
