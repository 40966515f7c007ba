"""Streaming drift/shift monitors: incremental two-sided Page CUSUM via
``applyInPandasWithState``.

The batch closed form (operators/temporal.py:cusum_online) is
S⁺_t = P_t − min(0, min_{j≤t} P_j) with P the running sum of
(x−μ0−k); the streaming fold keeps exactly (P, minP) per side per
entity — O(1) state per monitored key, forever (NoTimeout: a monitor
is supposed to outlive quiet periods; total state is bounded by the
number of monitored entities, not by time).

Input contract: an append-mode stream of per-(entity, day) counts —
e.g. a watermarked tumbling-window count upstream.  Append mode emits
each finalized (entity, day) exactly once, in nondecreasing watermark
order, so the fold sorts within the batch and skips anything at or
below the last folded day (a late duplicate would otherwise double-
count — skipped rows simply emit no output row, so a consumer
comparing emitted days against ingested days sees the gap).

Parity: tests/test_streaming_monitor.py pins stream output ==
cusum_online on the same counts.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType(), False),
        T.StructField("day", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("s_pos_micro", T.LongType(), False),
        T.StructField("s_neg_micro", T.LongType(), False),
        T.StructField("alarm_pos", T.BooleanType(), False),
        T.StructField("alarm_neg", T.BooleanType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pp", T.LongType(), False),
        T.StructField("min_pp", T.LongType(), False),
        T.StructField("pn", T.LongType(), False),
        T.StructField("min_pn", T.LongType(), False),
        T.StructField("last_day", T.StringType(), False),
    ]
)


def stream_cusum(
    daily_counts: DataFrame,
    mu0_micro: int,
    k_micro: int = 0,
    h_micro: int = 0,
    entity_col: str = "entity",
    day_col: str = "day",
    n_col: str = "n",
) -> DataFrame:
    """Incremental CUSUM over an append-mode (entity, day, n) stream.

    Emits one row per folded (entity, day) with the same values the
    batch ``cusum_online`` computes on the full history.
    """

    def fn(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.exists:
            pp, min_pp, pn, min_pn, last_day = state.get
        else:
            pp, min_pp, pn, min_pn, last_day = 0, 0, 0, 0, ""
        rows = []
        for pdf in pdfs:
            for _, r in pdf.sort_values(day_col).iterrows():
                day = str(r[day_col])
                if day <= last_day:
                    continue  # late duplicate of an already-folded day
                n = int(r[n_col])
                pp += n * 1_000_000 - mu0_micro - k_micro
                pn += mu0_micro - n * 1_000_000 - k_micro
                min_pp = min(min_pp, pp)
                min_pn = min(min_pn, pn)
                s_pos = pp - min(0, min_pp)
                s_neg = pn - min(0, min_pn)
                last_day = day
                rows.append(
                    (
                        entity,
                        day,
                        n,
                        s_pos,
                        s_neg,
                        s_pos > h_micro,
                        s_neg > h_micro,
                    )
                )
        state.update((pp, min_pp, pn, min_pn, last_day))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "entity",
                    "day",
                    "n",
                    "s_pos_micro",
                    "s_neg_micro",
                    "alarm_pos",
                    "alarm_neg",
                ],
            )

    src = daily_counts.select(
        daily_counts[entity_col].alias("entity"),
        daily_counts[day_col].alias("day"),
        daily_counts[n_col].alias("n"),
    )
    return src.groupBy("entity").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
