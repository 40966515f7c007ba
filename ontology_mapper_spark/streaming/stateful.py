"""Custom stateful streaming operator: conversation session tracking via
``applyInPandasWithState`` (the engine's stand-in for per-conversation
state a transcript firehose needs — open-session turn counts, last
activity, mention tallies).

State model: one state row per conv_id holding (n_turns, n_mentions,
last_ts_epoch). A conversation with no new turns for `session_gap` of
EVENT time is closed and emitted exactly once with its totals; the
watermark bounds state size (Spark evicts timed-out groups via
GroupStateTimeout.EventTimeTimeout).

Scale notes: state is partitioned by conv_id (the natural key — no skew
beyond a single conversation's turn rate); per-batch work is
Arrow-batched pandas over each group's new rows only.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("first_ts_us", T.LongType(), False),
        T.StructField("last_ts_us", T.LongType(), False),
    ]
)


def track_sessions(
    transcripts: DataFrame, session_gap: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """conv_id-keyed stateful fold over a transcript stream.

    Emits a running (closed=False) row per updated conversation per batch
    and a final (closed=True) row when the event-time timeout fires.
    """
    gap_us = _duration_us(session_gap)

    def fn(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_chars, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        conv_id,
                        n_turns,
                        n_chars,
                        pd.Timestamp(first_us, unit="us"),
                        pd.Timestamp(last_us, unit="us"),
                        True,
                    )
                ],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )
            return

        n_turns, n_chars, first_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_turns += len(pdf)
            n_chars += int(pdf["text"].str.len().sum())
            ts_us = (pdf["ts"].astype("int64") // 1000).astype("int64")  # ns→us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n_turns, n_chars, first_us, last_us))
        # clamp: a group whose last event already trails the watermark would
        # otherwise request a timeout in the past, which Spark rejects
        timeout_ms = max(
            last_us // 1000 + gap_us // 1000,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            [
                (
                    conv_id,
                    n_turns,
                    n_chars,
                    pd.Timestamp(first_us, unit="us"),
                    pd.Timestamp(last_us, unit="us"),
                    False,
                )
            ],
            columns=[f.name for f in SESSION_SCHEMA.fields],
        )

    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_us(text: str) -> int:
    n, unit = text.split()
    mult = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
    }[unit]
    return int(n) * mult


def track_sessions_batch(transcripts: DataFrame) -> DataFrame:
    """Batch equivalent (for cross-checking the stateful operator): final
    per-conversation totals, closed=True."""
    from pyspark.sql import functions as F

    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length("text")).alias("n_chars"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.lit(True).alias("closed"),
    )


def stream_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization on a STREAM via Spark's native
    ``session_window`` aggregate — byte-identical semantics to the
    batch `operators/temporal.py:sessionize_native` (same merge rule:
    touching windows merge, a new session needs a gap STRICTLY greater
    than ``gap``), because it IS the same operator; only the state
    machinery differs.

    In append mode a session row emits exactly once, when the watermark
    passes the session's close (last event + gap); until then the state
    store holds one open window per active user — O(active users), the
    bound a 10^12-event firehose needs, with eviction handled by the
    engine rather than hand-rolled timeout code (contrast
    ``track_sessions``, the applyInPandasWithState form kept for
    custom per-group state).

    Output matches the batch operator: (user_col, session_start,
    session_last, n_events) with microsecond-string timestamps.
    """
    from pyspark.sql import functions as F

    g = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_last"),
            F.count("*").alias("n_events"),
        )
    )
    return g.select(
        user_col,
        F.date_format("_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_last"
        ),
        F.col("n_events").cast("long"),
    )
