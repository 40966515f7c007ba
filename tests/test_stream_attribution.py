"""stream_last_touch parity: the streaming per-conversion last-touch
credit equals a batch computation of the same semantics (most recent
in-horizon touch per conversion, total order (ts, event_id))."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapper_spark.streaming import stream_last_touch

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark):
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: click -> view -> purchase (view wins: most recent)
        (1, at(0), 1, "click", 0.0),
        (2, at(10), 1, "view", 0.0),
        (3, at(20), 1, "purchase", 12.34),
        # u1 second purchase, no fresh touch: view STILL wins (stream
        # semantics credit every conversion with an in-horizon touch)
        (4, at(40), 1, "purchase", 5.0),
        # u2: touch far outside horizon -> conversion unattributed
        (5, at(0), 2, "click", 0.0),
        (6, at(60 * 30), 2, "purchase", 9.99),
        # u3: tie on ts broken by larger event_id
        (7, at(100), 3, "click", 0.0),
        (8, at(100), 3, "signup", 0.0),
        (9, at(110), 3, "purchase", 1.0),
        # u4: touches only, no conversion
        (10, at(5), 4, "view", 0.0),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _batch_expected(ev, horizon_us=24 * 3600 * 1_000_000):
    t = ev.where(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("t_us"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("t_type"),
    )
    c = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
        F.col("event_id").alias("c_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    j = c.join(
        t,
        (F.col("t_user") == F.col("c_user"))
        & (F.col("t_us") <= F.col("c_us"))
        & (F.col("t_us") >= F.col("c_us") - F.lit(horizon_us)),
    )
    w = Window.partitionBy("c_user", "c_id").orderBy(
        F.col("t_us").desc(), F.col("t_id").desc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_user", "c_id", "t_type", "t_id", "cents")
    )


def test_stream_last_touch_parity(spark, tmp_path):
    ev = _events(spark)
    # sentinel conversion+touch pair far in the future: advances BOTH
    # sides' watermarks past every real window end so all real windows
    # emit under availableNow; its own credit row is filtered out.
    t9 = dt.datetime(2024, 6, 1)
    sentinel = spark.createDataFrame(
        [
            (9001, t9, 999, "click", 0.0),
            (9002, t9 + dt.timedelta(minutes=1), 999, "purchase", 0.0),
        ],
        _SCHEMA,
    )
    src = str(tmp_path / "ev_src")
    ev.unionByName(sentinel).repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .parquet(src)
    )
    out = stream_last_touch(spark, stream, horizon="24 hours", window="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("lt_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "lt_ckpt"))
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.user_id, r.conv_id, r.touch_type, r.touch_id, r.cents)
        for r in spark.sql(
            "select * from lt_stream where user_id <> 999"
        ).collect()
    }
    expected = {
        (r.c_user, r.c_id, r.t_type, r.t_id, r.cents)
        for r in _batch_expected(ev).collect()
    }
    assert got == expected
    # u1's both purchases credited to the view; u2 unattributed; u3
    # tie broken by larger event_id (signup)
    assert (1, 3, "view", 2, 1234) in got
    assert (1, 4, "view", 2, 500) in got
    assert not any(u == 2 for (u, *_rest) in got)
    assert (3, 9, "signup", 8, 100) in got


def test_stream_last_touch_counts_candidates(spark, tmp_path):
    ev = _events(spark)
    t9 = dt.datetime(2024, 6, 1)
    sentinel = spark.createDataFrame(
        [
            (9001, t9, 999, "click", 0.0),
            (9002, t9 + dt.timedelta(minutes=1), 999, "purchase", 0.0),
        ],
        _SCHEMA,
    )
    src = str(tmp_path / "ev_src2")
    ev.unionByName(sentinel).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .parquet(src)
    )
    out = stream_last_touch(spark, stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lt_stream2")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "lt_ckpt2"))
        .start()
    )
    q.awaitTermination(240)
    by = {
        r.conv_id: r.n_candidate_touches
        for r in spark.sql(
            "select * from lt_stream2 where user_id <> 999"
        ).collect()
    }
    # u1 first purchase saw click+view; second purchase same two
    assert by[3] == 2 and by[4] == 2
    # u3 saw both tied touches
    assert by[9] == 2
