"""Streaming last-touch attribution: conversions credited to their most
recent in-horizon touch, continuously.

The batch attribution family (qb40/qb42/qc09/qb77/qb76/qc07) runs on a
closed corpus; marketing/ops dashboards want the same credit as events
ARRIVE.  `stream_last_touch` is the streaming form of the standard
last-touch definition — per conversion, the most recent touch by the
same user within the horizon — built from the two Structured Streaming
primitives this repo has already battle-tested (stream-stream range
join + chained windowed aggregation, the stream_windowed_comention
pattern):

* touches and conversions are two filtered views of ONE event stream,
  each with its own watermark;
* the inner join carries the event-time range predicate
  `touch.ts BETWEEN conv.ts - horizon AND conv.ts` — simultaneously the
  SEMANTIC horizon and the state-eviction bound;
* the per-conversion winner is a windowed max over the total order
  (touch ts, touch event_id) — group keys are (window(conv ts),
  user, conv id), so state evicts once the watermark passes each
  window.

Semantics note (deliberate, documented difference from qb40's batch
op): the batch `last_touch_attribution` assigns each TOUCH to its
nearest FOLLOWING conversion, so a second conversion with no fresh
touches lands in the 'none' bucket; this operator implements the
also-standard per-CONVERSION definition — every conversion is credited
to the most recent in-horizon touch even if an earlier conversion
already claimed it.  Un-attributed conversions (no in-horizon touch)
are absent from the inner-join output; route them from the raw stream
if a 'none' bucket is needed (a streaming left-outer would hold every
conversion until watermark+horizon for no informational gain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_last_touch(
    spark: SparkSession,
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    horizon: str = "24 hours",
    window: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """(window_start, window_end, user, conv_id, touch_type, touch_id,
    cents) — one row per attributed conversion, append mode."""
    touches = (
        events.where(F.col(type_col).isin(*touch_types))
        .select(
            F.col(user_col).alias("t_user"),
            F.col(ts_col).alias("t_ts"),
            F.col(id_col).cast("long").alias("t_id"),
            F.col(type_col).alias("t_type"),
        )
        .withWatermark("t_ts", horizon)
    )
    convs = (
        events.where(F.col(type_col) == conversion_type)
        .select(
            F.col(user_col).alias("c_user"),
            F.col(ts_col).alias("c_ts"),
            F.col(id_col).cast("long").alias("c_id"),
            F.round(F.col(val_col) * 100).cast("long").alias("c_cents"),
        )
        .withWatermark("c_ts", horizon)
    )
    cond = F.expr(
        f"""
        t_user = c_user
        AND t_ts BETWEEN c_ts - INTERVAL {horizon} AND c_ts
        """
    )
    joined = convs.join(touches, cond, "inner")
    best = F.max(
        F.struct(
            F.col("t_ts").alias("ts"),
            F.col("t_id").alias("id"),
            F.col("t_type").alias("ty"),
        )
    ).alias("_best")
    return (
        joined.groupBy(
            F.window("c_ts", window).alias("win"),
            "c_user",
            "c_id",
        )
        .agg(best, F.max("c_cents").alias("cents"),
             F.count("*").alias("n_candidate_touches"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            F.col("c_user").alias("user_id"),
            F.col("c_id").alias("conv_id"),
            F.col("_best.ty").alias("touch_type"),
            F.col("_best.id").alias("touch_id"),
            "cents",
            "n_candidate_touches",
        )
    )
