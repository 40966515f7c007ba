"""Bucketized point-in-interval join.

``points.ts BETWEEN intervals.start AND intervals.end`` written naively
(a theta join) gives Spark a BroadcastNestedLoopJoin — O(P·I) work and
a scale killer the moment neither side broadcasts.  The standard fix
(used by every warehouse range-join implementation) is to discretize
time into fixed-width buckets:

* each POINT belongs to exactly one bucket;
* each INTERVAL explodes to the buckets it overlaps;
* equi-join on (keys…, bucket), then re-check exact containment.

Because a point has ONE bucket, every qualifying (point, interval)
pair is produced exactly once — no post-join dedup.  Cost is
O(P + I·b + matches) where b = avg buckets per interval; pick
``bucket_width_us`` near the typical interval length so b ≲ 2.  A
``max_buckets_per_interval`` guard fails fast on degenerate inputs
(one month-long interval × 1 µs buckets) instead of silently exploding
the shuffle.

The join is a plain hash/sort-merge equi-join on (keys…, bucket) —
AQE-skew-splittable, pushdown-friendly, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    keys: tuple[str, ...] = (),
    bucket_width_us: int = 300_000_000,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner join of points to the intervals containing them.

    Returns all columns of both inputs (caller projects).  Interval
    rows whose [start, end] spans more than ``max_buckets_per_interval``
    buckets raise at planning time via a validated literal check —
    callers must widen the bucket or split the interval.
    """
    if bucket_width_us <= 0:
        raise ValueError("bucket_width_us must be positive")
    width = F.lit(int(bucket_width_us))
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    p = points.withColumn("_bucket", F.floor(p_us / width))
    n_buckets = F.floor(e_us / width) - F.floor(s_us / width) + 1
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(
                n_buckets <= max_buckets_per_interval,
                F.sequence(F.floor(s_us / width), F.floor(e_us / width)),
            ).otherwise(
                # raise_error keeps the guard inside the distributed plan:
                # one bad interval fails the job loudly, never OOMs it
                F.raise_error(
                    F.concat(
                        F.lit("interval spans too many buckets: "),
                        n_buckets.cast("string"),
                    )
                ).cast("array<bigint>")
            )
        ),
    )
    on = [*keys, "_bucket"]
    joined = iv.join(p, on, "inner").where(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")
