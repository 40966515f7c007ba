"""Salted skew operators + stateful streaming session tracking."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.datagen import build_transcripts
from ontology_mapper_spark.operators.skew import (
    hot_keys,
    salted_exact_distinct_count,
    salted_join_big_to_skewed_small,
)


def test_salted_distinct_count_matches_plain(spark):
    rows = [("hot", f"v{i % 97}") for i in range(3000)] + [
        ("cold", f"v{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r.k: r.n_distinct_v
        for r in salted_exact_distinct_count(df, "k", "v", salt=8).collect()
    }
    expect = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == expect == {"hot": 97, "cold": 50}


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(500)], ["k", "payload"]
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "tag"])
    got = sorted(
        (r.k, r.payload, r.tag)
        for r in salted_join_big_to_skewed_small(big, small, "k", salt=4).collect()
    )
    expect = sorted(
        (r.k, r.payload, r.tag) for r in big.join(small, "k").collect()
    )
    assert got == expect


def test_hot_keys_diagnostic(spark):
    rows = [("whale", i) for i in range(900)] + [(f"u{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["user", "x"])
    hk = hot_keys(df, "user", min_share=0.5).collect()
    assert len(hk) == 1 and hk[0].user == "whale"
    assert abs(hk[0].share - 0.9) < 1e-9


def test_stateful_sessions_match_batch(spark, tmp_path):
    from ontology_mapper_spark.streaming.detect import read_transcript_stream
    from ontology_mapper_spark.streaming.stateful import (
        track_sessions,
        track_sessions_batch,
    )

    src = str(tmp_path / "src")
    tr = build_transcripts(spark, n_convs=25, seed=4)
    tr.repartition(3).write.mode("overwrite").parquet(src)

    # watermark larger than the corpus time span: the unordered multi-file
    # batches then never drop late rows, so final totals must equal batch
    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    sessions = track_sessions(stream, session_gap="2 hours", watermark="48 hours")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sessions").collect()
    assert got, "stateful operator emitted nothing"
    # final totals per conv: the closed row if the timeout fired, else the
    # last (max-cumulative) running update
    latest = {}
    for r in got:
        cur = latest.get(r.conv_id)
        if cur is None or r.n_turns >= cur[0]:
            latest[r.conv_id] = (r.n_turns, r.n_chars, str(r.first_ts), str(r.last_ts))
    batch = {
        r.conv_id: (r.n_turns, r.n_chars, str(r.first_ts), str(r.last_ts))
        for r in track_sessions_batch(tr).collect()
    }
    # every conversation seen by the stream; totals equal batch on final update
    assert set(latest) == set(batch)
    mismatches = {c for c in batch if latest[c] != batch[c]}
    assert not mismatches, (list(mismatches)[:3], latest.get(list(mismatches)[0] if mismatches else None))

def test_stateful_session_timeout_closes(spark, tmp_path):
    """Event-time timeout: a later batch advances the watermark past an
    idle conversation's gap → exactly one closed row with final totals."""
    import time as _t
    from datetime import datetime, timedelta, timezone

    from ontology_mapper_spark.datagen.transcripts import transcripts_schema
    from ontology_mapper_spark.streaming.detect import read_transcript_stream
    from ontology_mapper_spark.streaming.stateful import track_sessions

    src = tmp_path / "src"
    src.mkdir()
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def rows(conv, ts_offsets):
        return [
            (conv, i, "user", f"turn {i}", None, t0 + timedelta(seconds=o))
            for i, o in enumerate(ts_offsets)
        ]

    early = spark.createDataFrame(rows("c_idle", [0, 60]), transcripts_schema())
    late = spark.createDataFrame(rows("c_fresh", [3600 * 4]), transcripts_schema())
    early.coalesce(1).write.parquet(str(src / "f1"))
    _t.sleep(1.1)  # file-source batch ordering is by modification time
    late.coalesce(1).write.parquet(str(src / "f2"))

    stream = read_transcript_stream(spark, f"{src}/*", max_files_per_trigger=1)
    sessions = track_sessions(stream, session_gap="10 minutes", watermark="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_to")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from sessions_to").collect()
    closed = [r for r in got if r.closed]
    assert [(r.conv_id, r.n_turns) for r in closed] == [("c_idle", 2)]
