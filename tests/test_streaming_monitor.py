"""Streaming CUSUM parity: the incremental applyInPandasWithState fold
must reproduce the batch closed form (operators/temporal.py:cusum_online)
exactly, across multiple micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.temporal import cusum_online
from ontology_mapper_spark.streaming.monitor import stream_cusum

MU0 = 3_000_000  # reference: 3 events/day
K = 500_000
H = 2_000_000


def _events(spark):
    # entity "a": 5 quiet days (2/day) then 5 loud days (6/day);
    # entity "b": constant 3/day (never alarms at mu0=3)
    rows = []
    for d in range(1, 11):
        n = 2 if d <= 5 else 6
        for _ in range(n):
            rows.append(("a", f"2024-02-{d:02d}T12:00:00"))
    for d in range(1, 11):
        for _ in range(3):
            rows.append(("b", f"2024-02-{d:02d}T12:00:00"))
    return spark.createDataFrame(rows, "entity string, ts_s string").selectExpr(
        "entity", "CAST(ts_s AS TIMESTAMP) AS ts"
    )


def test_cusum_online_closed_form(spark):
    ev = _events(spark)
    out = {
        (r["event_type"], r["day"]): r
        for r in cusum_online(ev, "entity", "ts", MU0, K, H)
        .withColumnRenamed("entity", "event_type")
        .collect()
    }
    # quiet days: diff_pos = 2e6-3e6-0.5e6 = -1.5e6/day -> S+ stays 0
    assert out[("a", "2024-02-05")]["s_pos_micro"] == 0
    # loud days: +2.5e6/day from day 6 -> day 8 S+ = 7.5e6 > H (alarm)
    assert out[("a", "2024-02-08")]["s_pos_micro"] == 7_500_000
    assert out[("a", "2024-02-08")]["alarm_pos"]
    # S- grows during the quiet half: mu0-x-k = +0.5e6/day
    assert out[("a", "2024-02-05")]["s_neg_micro"] == 2_500_000
    assert out[("a", "2024-02-05")]["alarm_neg"]
    # steady entity never alarms either side (diff_pos=-0.5e6, diff_neg=-0.5e6)
    assert out[("b", "2024-02-10")]["s_pos_micro"] == 0
    assert out[("b", "2024-02-10")]["s_neg_micro"] == 0


def test_stream_cusum_matches_batch(spark, tmp_path):
    ev = _events(spark)
    counts = (
        ev.select("entity", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .groupBy("entity", "day")
        .agg(F.count("*").cast("long").alias("n"))
    )
    # write day-ordered file chunks so each micro-batch delivers a
    # contiguous, increasing day range (the append-mode upstream contract)
    src = str(tmp_path / "counts")
    for i, (lo, hi) in enumerate([(1, 4), (5, 8), (9, 10)]):
        (
            counts.where(
                (F.col("day") >= f"2024-02-{lo:02d}")
                & (F.col("day") <= f"2024-02-{hi:02d}")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={i}")
        )
    stream = (
        spark.readStream.schema("entity string, day string, n long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    q = (
        stream_cusum(stream, MU0, K, H)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["entity"], r["day"]): (
            r["n"],
            r["s_pos_micro"],
            r["s_neg_micro"],
            r["alarm_pos"],
            r["alarm_neg"],
        )
        for r in spark.sql("select * from cusum_stream").collect()
    }
    expect = {
        (r["entity"], r["day"]): (
            r["n"],
            r["s_pos_micro"],
            r["s_neg_micro"],
            r["alarm_pos"],
            r["alarm_neg"],
        )
        for r in cusum_online(_events(spark), "entity", "ts", MU0, K, H).collect()
    }
    assert got == expect
    assert len(got) == 20
