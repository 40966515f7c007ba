"""Streaming SLO burn parity: the windowed streaming monitor must
reproduce the batch slo_burn_rate 1h numbers per closed window
exactly (same mirrored division)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.temporal import slo_burn_rate
from ontology_mapper_spark.streaming.monitor import stream_slo_burn


def _rows(spark):
    rows = []
    rid = 0
    # hour 1: 40 ok + 10 errors (burn 1000/100 = full-outage-ish);
    # hour 2: 50 ok + 1 error; hour 4: sentinel that advances the
    # watermark past hour 2's end but stays open itself
    for hour, ok, err in [(1, 40, 10), (2, 50, 1), (4, 1, 0)]:
        for i in range(ok):
            rid += 1
            rows.append((rid, f"2024-03-01T{hour:02d}:10:00", False))
        for i in range(err):
            rid += 1
            rows.append((rid, f"2024-03-01T{hour:02d}:20:00", True))
    return spark.createDataFrame(
        rows, "rid long, ts_s string, is_err boolean"
    ).selectExpr("rid", "CAST(ts_s AS TIMESTAMP) AS ts", "is_err")


def test_stream_slo_burn_matches_batch(spark, tmp_path):
    ev = _rows(spark)
    src = str(tmp_path / "ev")
    for i, hour in enumerate((1, 2, 4)):
        (
            ev.where(F.hour("ts") == hour)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={i}")
        )
    stream = (
        spark.readStream.schema("rid long, ts timestamp, is_err boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    q = (
        stream_slo_burn(stream, "ts", "is_err", 1000, "1 hour", "30 minutes")
        .writeStream.format("memory")
        .queryName("slo_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start"].hour: (r["n"], r["err"], r["burn_milli"], r["page"])
        for r in spark.sql("select * from slo_stream").collect()
    }
    # hour 4's window is still open (watermark has not passed its end)
    assert set(got) == {1, 2}
    # parity against the batch operator on the same rows
    batch = {
        r["hour_idx"] % 24: (
            r["n_1h"],
            r["err_1h"],
            r["burn_1h_milli"],
        )
        for r in slo_burn_rate(ev, "ts", "is_err", 1000).collect()
    }
    for h in (1, 2):
        assert got[h][:3] == batch[h]
    # semantics: hour 1 pages (burn 10/0.1 = 2000/1000... actually
    # err/n / slo = (10/50)/0.1 = 2x -> 2000 milli, below 14.4x)
    assert got[1][2] == 2000
    assert not got[1][3]
    assert got[2][2] == round(1 / 51 / 0.1 * 1000)
