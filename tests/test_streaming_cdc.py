"""Streaming CDC maintenance: micro-batched changelog folded into a
parquet snapshot must equal the batch apply_changes over the full log —
for any file split, including out-of-order seq delivery — plus
incremental catch-up, compaction, and vacuum semantics."""

from __future__ import annotations

import random

from pyspark.sql import types as T

from ontology_mapper_spark.operators.cdc import apply_changes
from ontology_mapper_spark.streaming.cdc import (
    compact_snapshot,
    read_snapshot,
    read_snapshot_versioned,
    start_cdc_maintenance,
    vacuum_snapshot,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("st", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _make_log(rng: random.Random, n: int, seq0: int = 1) -> list[tuple]:
    log = []
    for seq in range(seq0, seq0 + n):
        k = rng.randrange(25)
        op = rng.choice(["I", "U", "U", "D"])
        log.append((k, f"s{seq}", seq * 7, seq, op))
    return log


def _batch_expected(spark, log):
    base = spark.createDataFrame([], T.StructType(SCHEMA.fields[:3]))
    changes = spark.createDataFrame(log, SCHEMA)
    out = apply_changes(base, changes, key_cols=["k"], seq_col="seq")
    return {(r.k, r.st, r.v) for r in out.collect()}


def _run_stream(spark, src_dir, snap_dir, ckpt_dir, files_per_trigger=1):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        start_cdc_maintenance(
            stream, snap_dir, ckpt_dir, key_cols=["k"], seq_col="seq"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_cdc_parity_out_of_order_batches(spark, tmp_path):
    rng = random.Random(3)
    log = _make_log(rng, 120)
    # adversarial split: shuffle rows so later FILES carry OLDER seqs —
    # tombstone retention must keep the fold order-independent
    shuffled = log[:]
    rng.shuffle(shuffled)
    src = str(tmp_path / "chg")
    for i in range(6):
        spark.createDataFrame(shuffled[i * 20 : (i + 1) * 20], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    _run_stream(spark, src, snap, ckpt)
    got = {(r.k, r.st, r.v) for r in read_snapshot(spark, snap).collect()}
    assert got == _batch_expected(spark, log)
    # tombstones retained in the versioned view for keys whose winner is D
    versioned = read_snapshot_versioned(spark, snap)
    winners = {r.k: r._op for r in versioned.collect()}
    live_keys = {k for (k, _st, _v) in got}
    assert any(op == "D" for op in winners.values())
    assert {k for k, op in winners.items() if op != "D"} == live_keys


def test_stream_cdc_incremental_catchup_and_replay(spark, tmp_path):
    rng = random.Random(9)
    wave1 = _make_log(rng, 60, seq0=1)
    wave2 = _make_log(rng, 60, seq0=1001)
    src = str(tmp_path / "chg")
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    for i in range(3):
        spark.createDataFrame(wave1[i * 20 : (i + 1) * 20], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
    _run_stream(spark, src, snap, ckpt)
    assert {
        (r.k, r.st, r.v) for r in read_snapshot(spark, snap).collect()
    } == _batch_expected(spark, wave1)
    gen1 = read_snapshot_versioned(spark, snap)

    # restart with the SAME checkpoint and no new files: a no-op
    _run_stream(spark, src, snap, ckpt)
    assert read_snapshot_versioned(spark, snap).count() == gen1.count()

    # append wave 2; only the new files are processed, snapshot catches up
    for i in range(3):
        spark.createDataFrame(wave2[i * 20 : (i + 1) * 20], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
    _run_stream(spark, src, snap, ckpt)
    assert {
        (r.k, r.st, r.v) for r in read_snapshot(spark, snap).collect()
    } == _batch_expected(spark, wave1 + wave2)


def test_compact_drops_old_tombstones_keeps_live(spark, tmp_path):
    log = [
        (1, "a", 10, 1, "I"),
        (1, "a", 10, 2, "D"),   # old tombstone -> compacted away
        (2, "b", 20, 3, "I"),
        (3, "c", 30, 4, "I"),
        (3, "c", 30, 1005, "D"),  # recent tombstone -> kept
    ]
    src = str(tmp_path / "chg")
    spark.createDataFrame(log, SCHEMA).coalesce(1).write.parquet(src)
    snap, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    _run_stream(spark, src, snap, ckpt, files_per_trigger=10)
    compact_snapshot(spark, snap, tombstone_horizon_seq=1000)
    versioned = {(r.k, r._op) for r in read_snapshot_versioned(spark, snap).collect()}
    assert versioned == {(2, "I"), (3, "D")}
    assert {(r.k, r.st, r.v) for r in read_snapshot(spark, snap).collect()} == {
        (2, "b", 20)
    }
    removed = vacuum_snapshot(snap)
    assert removed  # the pre-compaction generation went away
    # snapshot still readable after vacuum
    assert read_snapshot(spark, snap).count() == 1
