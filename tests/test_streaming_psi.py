"""Streaming PSI parity: the windowed streaming monitor must
reproduce the batch psi_drift totals per window exactly (same micro
shares, same fixed-order double ln)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.stats import psi_drift
from ontology_mapper_spark.streaming.monitor import stream_psi_drift

BASELINE = [40, 30, 20, 10, 0, 0, 0, 0, 0, 0]  # counts per 10 bins


def _rows(spark):
    # day 1 roughly matches the baseline shape; day 2 is shifted hard
    rows = []
    rid = 0
    for day, dist in [
        (1, [20, 15, 10, 5, 0, 0, 0, 0, 0, 0]),
        (2, [0, 0, 0, 0, 5, 10, 15, 20, 0, 0]),
        # day 3 is a sentinel: it advances the watermark past day 2's
        # window end; its own window stays open and must NOT emit
        (3, [1, 0, 0, 0, 0, 0, 0, 0, 0, 0]),
    ]:
        for b, c in enumerate(dist):
            for _ in range(c):
                rid += 1
                rows.append(
                    (rid, f"2024-03-{day:02d}T06:00:00", b * 100 + 50)
                )
    return spark.createDataFrame(
        rows, "rid long, ts_s string, v long"
    ).selectExpr("rid", "CAST(ts_s AS TIMESTAMP) AS ts", "v")


def _batch_psi(spark, day_rows):
    # batch form: baseline rows flagged 0 + the window's rows flagged 1
    base = []
    rid = 0
    for b, c in enumerate(BASELINE):
        for _ in range(c):
            rid += 1
            base.append((rid, 0, b * 100 + 50))
    cur = [(rid + i + 1, 1, v) for i, v in enumerate(day_rows)]
    df = spark.createDataFrame(base + cur, "id long, cur long, v long")
    out = psi_drift(df, "v", F.col("cur") == 1, 100, 10).collect()
    return out[0]["psi_total_micro"], out[0]["drift_level"]


def test_stream_psi_matches_batch(spark, tmp_path):
    ev = _rows(spark)
    src = str(tmp_path / "ev")
    for i, day in enumerate((1, 2, 3)):
        (
            ev.where(F.dayofmonth("ts") == day)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={i}")
        )
    stream = (
        spark.readStream.schema("rid long, ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    q = (
        stream_psi_drift(stream, "ts", "v", BASELINE, 100, "1 day", "1 hour")
        .writeStream.format("memory")
        .queryName("psi_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start"][:10]: (
            r["n_rows"],
            r["psi_total_micro"],
            r["drift_level"],
        )
        for r in spark.sql("select * from psi_stream").collect()
    }
    # day 3's window is still open (watermark has not passed its end)
    assert set(got) == {"2024-03-01", "2024-03-02"}
    # per-window parity against the batch operator
    day1_vals = [r["v"] for r in ev.where(F.dayofmonth("ts") == 1).collect()]
    day2_vals = [r["v"] for r in ev.where(F.dayofmonth("ts") == 2).collect()]
    psi1, lvl1 = _batch_psi(spark, day1_vals)
    psi2, lvl2 = _batch_psi(spark, day2_vals)
    assert got["2024-03-01"] == (50, psi1, lvl1)
    assert got["2024-03-02"] == (50, psi2, lvl2)
    # and the semantics are right: matching day calm, shifted day loud
    assert lvl1 == 0 and lvl2 == 2
