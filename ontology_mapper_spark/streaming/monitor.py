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


def stream_psi_drift(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    baseline_counts: list[int],
    bin_width: int = 100,
    window_duration: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming PSI drift monitor: per event-time tumbling window the
    Population Stability Index of the value distribution against a
    STATIC baseline histogram (computed batch-side and passed in as
    plain integer counts) — the live companion to the batch
    psi_drift (qb69): one alert row per closed window.

    Shape: ONE watermarked window aggregation whose per-bin counts are
    fixed conditional-sum COLUMNS (bin count is a dimension), so no
    chained stateful operators and no per-row Python; everything after
    the agg is a stateless projection where the baseline enters as
    folded literals.  The PSI arithmetic is formula-identical to the
    batch operator (micro-rounded shares, fixed-order double ln, int
    term products) — parity pinned by the unit test.

    Output (append mode, rows finalize at watermark): (window_start,
    n_rows, psi_total_micro, drift_level).
    """
    from pyspark.sql import functions as F

    b = len(baseline_counts)
    nb = sum(baseline_counts)
    binned = stream.withColumn(
        "_bin",
        F.least(
            (F.col(value_col).cast("long") / F.lit(int(bin_width)))
            .cast("long"),
            F.lit(b - 1),
        ),
    )
    agg = (
        binned.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("_w"))
        .agg(
            F.count("*").cast("long").alias("_n"),
            *[
                F.sum(F.when(F.col("_bin") == i, 1).otherwise(0))
                .cast("long")
                .alias(f"_c{i}")
                for i in range(b)
            ],
        )
    )
    terms = []
    for i, cb in enumerate(baseline_counts):
        cc = F.col(f"_c{i}")
        sb = F.round(
            F.lit((cb + 1) * 1_000_000) / F.lit(nb + b)
        ).cast("long")
        sc = F.round(
            (cc + 1) * F.lit(1_000_000) / (F.col("_n") + b)
        ).cast("long")
        lr = F.round(
            F.log(
                F.lit(float(cb + 1))
                * (F.col("_n") + b).cast("double")
                / ((cc + 1).cast("double") * F.lit(float(nb + b)))
            )
            * F.lit(1_000_000.0)
        ).cast("long")
        terms.append(
            F.round((sb - sc) * lr / F.lit(1_000_000)).cast("long")
        )
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    return agg.select(
        F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.col("_n").alias("n_rows"),
        psi.cast("long").alias("psi_total_micro"),
        F.when(psi > 250_000, F.lit(2))
        .when(psi > 100_000, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("drift_level"),
    )


def stream_slo_burn(
    stream: DataFrame,
    ts_col: str,
    error_col: str,
    slo_bp: int = 1000,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    page_milli: int = 14_400,
) -> DataFrame:
    """Streaming SLO burn-rate monitor: per event-time tumbling hour,
    the error-budget burn of a boolean error flag against a fixed SLO
    budget — the live fast-window half of the batch multi-window rule
    (qc92; the slow 6h window stays a batch concern since it tolerates
    latency by definition).

    Shape mirrors stream_psi_drift: ONE watermarked window aggregation
    (count + conditional error sum — no chained stateful operators, no
    Python), then a stateless projection computing
    burn_milli = round(err·1e7/(n·slo_bp)) with the SAME mirrored
    division as the batch operator — parity pinned by the unit test.

    Output (append mode, rows finalize at watermark): (window_start,
    n, err, burn_milli, page).
    """
    from pyspark.sql import functions as F

    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("_w"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(error_col).cast("int")).cast("long").alias("err"),
        )
    )
    burn = F.when(
        F.col("n") > 0,
        F.round(
            F.col("err") * 10_000_000 / (F.col("n") * F.lit(int(slo_bp)))
        ).cast("long"),
    )
    return agg.select(
        F.col("_w.start").alias("window_start"),
        "n",
        "err",
        burn.alias("burn_milli"),
        F.coalesce(burn >= int(page_milli), F.lit(False)).alias("page"),
    )
