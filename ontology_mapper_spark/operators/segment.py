"""User segmentation: RFM (recency / frequency / monetary) scoring.

The classic warehouse segmentation over an event stream — per user, the
days since their last purchase, their purchase count, and their total
spend, each scored 1..n_tiles by rank percentile.  The 100 TB shape
constraint: NO global row-level window (the naive `ntile(5)` over every
user is a single-task sort at scale — the qb04 class).  Scores here are
closed-form from cumulative counts over the metric's DISTINCT-VALUE
histogram, computed two-phase (per-bucket offsets, then a window
partitioned by bucket) so no unpartitioned window ever sees an
unbounded input.

Score definition (value-based, implementation-independent, which is
what lets the oracle mirror it with a plain rank): for a metric where
HIGHER is better, score = 1 + floor(n_tiles * cum_before / n_users)
where cum_before = number of users with a strictly smaller value.  Ties
share a score; recency scores on the NEGATED day-gap so fresher users
score higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def _histogram_score(
    users: DataFrame,
    col: str,
    n_tiles: int,
    n_users: int,
    bucket_div: int = 1 << 16,
) -> DataFrame:
    """(value → score) map for one metric, two-phase cumulative rank.

    Phase 1: per-bucket (value div bucket_div) totals, cumulative window
    over the BUCKET table (bounded: value-range / bucket_div rows).
    Phase 2: within-bucket cumulative window PARTITIONED by bucket.
    cum_before(v) = bucket offset + within-bucket prefix, exactly the
    count of users with value < v.
    """
    hist = users.groupBy(F.col(col).alias("_v")).agg(
        F.count("*").cast("long").alias("_c")
    )
    hist = hist.withColumn("_b", F.expr(f"_v div {bucket_div}"))
    btot = hist.groupBy("_b").agg(F.sum("_c").alias("_bc"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    offsets = btot.select(
        "_b", (F.sum("_bc").over(wb) - F.col("_bc")).alias("_off")
    )
    wv = (
        Window.partitionBy("_b")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        hist.join(F.broadcast(offsets), "_b")
        .select(
            "_v",
            (F.col("_off") + F.sum("_c").over(wv) - F.col("_c")).alias(
                "_cum_before"
            ),
        )
    )
    return cum.select(
        "_v",
        (
            1
            + F.expr(
                f"CAST({n_tiles} AS BIGINT) * _cum_before"
                f" div CAST({n_users} AS BIGINT)"
            )
        )
        .cast("long")
        .alias("_score"),
    )


def rfm_segments(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    val_col: str = "value",
    purchase_type: str = "purchase",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segment census: users scored 1..n_tiles on each axis, then
    one row per (r_score, f_score, m_score) cell with the census.

    Users with zero purchases are out of scope (no recency exists —
    documented contract).  Recency is whole UTC days between the user's
    last purchase and the CORPUS-max purchase day (a parameter-free
    anchor that keeps the report a pure function of the data).  Value
    is fixed to integer cents per row before summation.

    Output: (r_score, f_score, m_score, n_users, total_purchases,
    total_cents).
    """
    p = df.where(F.col(type_col) == purchase_type).select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {_DAY_US}"
        ).alias("_dayn"),
        F.round(F.col(val_col) * 100).cast("long").alias("_cents"),
    )
    users = p.groupBy("_u").agg(
        F.max("_dayn").alias("_last"),
        F.count("*").cast("long").alias("_f"),
        F.sum("_cents").cast("long").alias("_m"),
    )
    ref = users.agg(F.max("_last").alias("_ref"))
    users = users.join(F.broadcast(ref)).select(
        "_u",
        (F.col("_last") - F.col("_ref")).alias("_rneg"),
        "_f",
        "_m",
    )
    n_users = users.count()  # one scalar action, reused by all 3 maps
    sr = _histogram_score(users, "_rneg", n_tiles, n_users)
    sf_ = _histogram_score(users, "_f", n_tiles, n_users)
    sm = _histogram_score(users, "_m", n_tiles, n_users)
    scored = (
        users.join(
            sr.withColumnRenamed("_score", "r_score"),
            users["_rneg"] == sr["_v"],
        )
        .drop("_v")
        .join(
            sf_.withColumnRenamed("_score", "f_score"),
            users["_f"] == sf_["_v"],
        )
        .drop("_v")
        .join(
            sm.withColumnRenamed("_score", "m_score"),
            users["_m"] == sm["_v"],
        )
        .drop("_v")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("_f").cast("long").alias("total_purchases"),
        F.sum("_m").cast("long").alias("total_cents"),
    )
