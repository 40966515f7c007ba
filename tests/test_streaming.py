"""Structured Streaming surface: file-source micro-batches → mention
stream → watermarked windowed counts, cross-checked against the batch
operators on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.datagen import build_transcripts
from ontology_mapper_spark.pipeline import detect_mentions
from ontology_mapper_spark.streaming import (
    read_transcript_stream,
    stream_detect_mentions,
    windowed_mention_counts,
)

PATTERNS = ["pain", "chronic pain"]


def _write_input(spark, tmp_path, n_convs=40):
    src = str(tmp_path / "stream_src")
    tr = build_transcripts(spark, n_convs=n_convs, seed=9, mention_labels=PATTERNS)
    tr.repartition(4).write.mode("overwrite").parquet(src)
    return src, tr


def test_stream_detect_matches_batch(spark, tmp_path):
    src, tr = _write_input(spark, tmp_path)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming
    mentions = stream_detect_mentions(spark, stream, PATTERNS)
    q = (
        mentions.writeStream.format("memory")
        .queryName("m_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern)
        for r in spark.sql("select * from m_stream").collect()
    }
    batch = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern)
        for r in detect_mentions(spark, tr, PATTERNS).collect()
    }
    assert got == batch
    assert len(got) > 0


def test_stream_scrub_matches_batch(spark, tmp_path):
    """stream_scrub == the batch scrub chain (nfc_scrub clean text →
    redact) row-for-row, with non-text columns untouched — including
    rows that exercise the PII patterns, the non-ASCII Arrow NFC lane,
    and the ASCII JVM lane."""
    from pyspark.sql import types as T

    from ontology_mapper_spark.operators.pii import redact
    from ontology_mapper_spark.operators.unicode_norm import nfc_scrub
    from ontology_mapper_spark.streaming import stream_scrub

    rows = [
        ("c1", 0, "user", "mail me at a.b@example.com please", "t", 1_000_000),
        ("c1", 1, "agent", "café résumé +1 555 123 4567", "t", 2_000_000),
        ("c2", 0, "user", "plain ascii, nothing to scrub", "t", 3_000_000),
        ("c2", 1, "agent", "ctrl\x07chars\x00here 192.168.0.1", "t", 4_000_000),
    ]
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts_us", T.LongType()),
        ]
    )
    tr = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    ).drop("ts_us")
    src = str(tmp_path / "scrub_src")
    tr.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_scrub(stream)
        .writeStream.format("memory")
        .queryName("scrub_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in spark.sql("select * from scrub_stream").collect()
    }
    clean = nfc_scrub(tr, "text", "conv_id")  # keyed per-row via conv+turn
    batch_df = (
        tr.withColumnRenamed("text", "_raw0")
        .join(
            nfc_scrub(
                tr.select(
                    F.concat_ws("#", "conv_id", "turn_idx").alias("_k"), "text"
                ),
                "text",
                "_k",
            ).select("_k", "clean"),
            F.concat_ws("#", "conv_id", "turn_idx") == F.col("_k"),
        )
        .withColumn("text", redact(F.col("clean")))
    )
    batch = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in batch_df.collect()
    }
    assert got == batch
    # scrubbing actually happened: the email and phone are gone
    texts = {t for (_, _, _, t, _) in got}
    assert not any("a.b@example.com" in t for t in texts)
    assert any("café" in t for t in texts)  # NFC composed the accent
    del clean


def test_stream_link_matches_batch(spark, tmp_path):
    """Streaming link stage == batch link_mentions on the same data, and
    the event-time column survives for downstream watermarking."""
    from ontology_mapper_spark.datagen import build_snapshot
    from ontology_mapper_spark.pipeline import build_dictionary, link_mentions
    from ontology_mapper_spark.streaming import stream_link_mentions

    src, tr = _write_input(spark, tmp_path, n_convs=20)
    terms, _ = build_snapshot(spark, n_terms=30, seed=1)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
    links = stream_link_mentions(spark, stream, terms)
    assert links.isStreaming and "ts" in links.columns
    q = (
        links.writeStream.format("memory")
        .queryName("l_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern, r.class_iri, r.rank)
        for r in spark.sql("select * from l_stream").collect()
    }
    batch_m = detect_mentions(spark, tr, build_dictionary(terms))
    batch = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern, r.class_iri, r.rank)
        for r in link_mentions(spark, batch_m, terms, idf=None).collect()
    }
    assert got == batch and len(got) > 0


def test_stream_exact_dedup_drops_reseen_content(spark, tmp_path):
    """Watermarked streaming dedup: duplicates across micro-batches are
    dropped, and the survivor set matches the batch exact_dedup content
    groups on the same data."""
    from datetime import datetime

    from ontology_mapper_spark.operators.dedup import exact_dedup
    from ontology_mapper_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "dedup_src")
    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "hello world", "t", t0),
        ("c2", 0, "user", "Hello  world", "t", t0),   # dup after normalize
        ("c3", 0, "user", "something else", "t", t0),
        ("c4", 0, "user", "hello world", "t", t0),    # dup again
        ("c5", 0, "user", "unique five", "t", t0),
    ]
    from ontology_mapper_spark.datagen.transcripts import transcripts_schema

    df = spark.createDataFrame(rows, transcripts_schema())
    df.repartition(3).write.mode("overwrite").parquet(src)

    stream = read_transcript_stream(spark, src, max_files_per_trigger=1)
    deduped = stream_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("sd_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sd_stream").collect()
    # one survivor per normalized-content group, same group count as batch
    batch_groups = exact_dedup(df, "text", "turn_idx").count()
    assert len(got) == 3 == batch_groups
    assert len({" ".join(r.text.lower().split()) for r in got}) == 3


def test_windowed_counts_with_watermark(spark, tmp_path):
    src, tr = _write_input(spark, tmp_path)
    stream = read_transcript_stream(spark, src)
    counts = windowed_mention_counts(
        spark, stream, PATTERNS, window="1 minute", watermark="2 minutes"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from wm_counts").collect()
    # batch equivalent: same windows computed eagerly
    m = detect_mentions(spark, tr, PATTERNS)
    batch = (
        m.join(
            tr.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"]
        )
        .groupBy(F.window("ts", "1 minute").alias("win"), "pattern")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("window_start"),
            "pattern",
            "n_mentions",
        )
    )
    batch_map = {
        (str(r.window_start), r.pattern): r.n_mentions for r in batch.collect()
    }
    got_map = {(str(r.window_start), r.pattern): r.n_mentions for r in got}
    # append-mode emits only windows the watermark has closed; with
    # availableNow all input is consumed, so closed windows must agree and
    # be a meaningful subset
    assert got_map
    for k, v in got_map.items():
        assert batch_map.get(k) == v, k


def test_stream_comention_matches_batch(spark, tmp_path):
    """Stream-stream self-join co-mention events, aggregated, == the batch
    comention_edges on the same transcripts (same window_turns); and the
    event form is loss-free (counts are algebraic)."""
    from collections import Counter

    from ontology_mapper_spark.datagen import build_snapshot
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )
    from ontology_mapper_spark.pipeline.comention import comention_edges
    from ontology_mapper_spark.streaming import stream_comention_edges

    from ontology_mapper_spark.datagen import build_transcripts
    from ontology_mapper_spark.datagen.snapshot import ontology_terms_rows

    # input mentioning MANY distinct linkable labels (comention needs ≥2
    # distinct entities inside a window)
    labels = sorted({r["label"] for r in ontology_terms_rows(30, 1)})
    tr = build_transcripts(spark, n_convs=20, seed=9, mention_labels=labels)
    src = str(tmp_path / "stream_src_ce")
    tr.repartition(4).write.mode("overwrite").parquet(src)
    terms, _ = build_snapshot(spark, n_terms=30, seed=1)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
    # ts_horizon must cover the event-time DISORDER across micro-batches
    # here (files are randomly partitioned and conversation t0 spreads over
    # a day), else the watermark marks later files' rows late and parity
    # breaks; in production the horizon only needs to cover source
    # disorder + W turns.
    edges = stream_comention_edges(
        spark, stream, terms, window_turns=2, ts_horizon="2 days"
    )
    assert edges.isStreaming
    q = (
        edges.writeStream.format("memory")
        .queryName("ce_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ce_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got_events = spark.sql("select * from ce_stream").collect()
    got = Counter((r.entity_a, r.entity_b) for r in got_events)

    batch_links = link_mentions(
        spark, detect_mentions(spark, tr, build_dictionary(terms)), terms, idf=None
    )
    want = {
        (r.entity_a, r.entity_b): r.n_comentions
        for r in comention_edges(batch_links, window_turns=2).collect()
    }
    assert dict(got) == want and len(want) > 0


def test_stream_windowed_comention_counts_parity(spark, tmp_path):
    """VERDICT r2 item 9: tumbling-window per-pair counts chained onto the
    stream-stream co-mention join. Two parity claims: (a) every emitted
    window agrees with the batch-computed windows, (b) counts are
    algebraic, so the per-pair sum across windows equals batch
    comention_edges exactly."""
    from collections import Counter

    from ontology_mapper_spark.datagen import build_snapshot, build_transcripts
    from ontology_mapper_spark.datagen.snapshot import ontology_terms_rows
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )
    from ontology_mapper_spark.pipeline.comention import comention_edges
    from ontology_mapper_spark.streaming import stream_windowed_comention_counts

    labels = sorted({r["label"] for r in ontology_terms_rows(30, 1)})
    tr = build_transcripts(spark, n_convs=20, seed=9, mention_labels=labels)
    src = str(tmp_path / "stream_src_wcc")
    # Append-mode window counts only emit once the watermark passes a
    # window's end; the final real window can therefore never close off
    # its own data. A SENTINEL turn far past the corpus pushes the final
    # watermark beyond every real window end, so ALL real windows emit
    # and exact totals parity becomes provable. The sentinel must contain
    # exactly ONE linkable label: the watermark node sits AFTER mention
    # detection, so a no-mention row never advances it — while a single
    # mention can never form a co-mention pair, so no sentinel events
    # pollute the counts. Everything lands in ONE micro-batch
    # (max_files_per_trigger covers all files) — cross-batch event-time
    # disorder is the existing event-level test's subject, not this one's.
    sentinel = tr.limit(1).select(
        F.lit("zz_sentinel").alias("conv_id"),
        "turn_idx", "role",
        F.lit(labels[0]).alias("text"),
        "tool",
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
    )
    tr.unionByName(sentinel).repartition(4).write.mode("overwrite").parquet(src)
    terms, _ = build_snapshot(spark, n_terms=30, seed=1)
    stream = read_transcript_stream(spark, src, max_files_per_trigger=100)
    counts = stream_windowed_comention_counts(
        spark, stream, terms,
        window_turns=2, ts_horizon="2 days", window="1 hour",
    )
    assert counts.isStreaming
    q = (
        counts.writeStream.format("memory")
        .queryName("wcc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "wcc_ckpt"))
        .start()
    )
    q.awaitTermination(240)
    got = spark.sql("select * from wcc_stream").collect()

    batch_links = link_mentions(
        spark, detect_mentions(spark, tr, build_dictionary(terms)), terms, idf=None
    )
    want_totals = {
        (r.entity_a, r.entity_b): r.n_comentions
        for r in comention_edges(batch_links, window_turns=2).collect()
    }
    # (a) per-window agreement vs batch-computed windows over the events
    ments = (
        batch_links.join(
            tr.select("conv_id", "turn_idx", "ts"), ["conv_id", "turn_idx"]
        )
        .select("conv_id", "turn_idx", "ts", F.col("class_iri").alias("entity"))
        .distinct()
    )
    a, b = ments.alias("a"), ments.alias("b")
    batch_events = a.join(
        b,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("b.turn_idx") >= F.col("a.turn_idx") - 2)
        & (F.col("b.turn_idx") <= F.col("a.turn_idx") + 2)
        & (F.col("a.entity") < F.col("b.entity")),
    ).select(
        F.col("a.entity").alias("entity_a"),
        F.col("b.entity").alias("entity_b"),
        F.col("a.ts").alias("ts"),
    )
    want_windows = {
        (str(r.window_start), r.entity_a, r.entity_b): r.n
        for r in batch_events.groupBy(
            F.window("ts", "1 hour").alias("win"), "entity_a", "entity_b"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "entity_a", "entity_b", "n")
        .collect()
    }
    got_windows = {
        (str(r.window_start), r.entity_a, r.entity_b): r.n_comentions for r in got
    }
    assert got_windows
    for k, v in got_windows.items():
        assert want_windows.get(k) == v, k
    # (b) algebraic-sum parity: all windows closed (availableNow consumed
    # everything and the final watermark passed), so totals match exactly
    totals = Counter()
    for r in got:
        totals[(r.entity_a, r.entity_b)] += r.n_comentions
    assert dict(totals) == want_totals and len(want_totals) > 0


def test_stream_sessionize_native_parity(spark, tmp_path):
    """Native session_window on a stream emits, in append mode, exactly
    the batch sessionize_native rows once a far-future sentinel pushes
    the watermark past every real session's close."""
    from datetime import datetime, timedelta

    from ontology_mapper_spark.operators.temporal import sessionize_native
    from ontology_mapper_spark.streaming.stateful import stream_sessionize

    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, base), (1, base + timedelta(minutes=10)),   # session A (merged)
        (1, base + timedelta(hours=3)),                 # session B
        (2, base + timedelta(minutes=5)),               # session C
    ]
    sentinel = [(-1, base + timedelta(days=30))]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        rows + sentinel, "user_id bigint, ts timestamp"
    ).repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 100)
        .parquet(src)
    )
    out = stream_sessionize(stream, gap="30 minutes", watermark="1 minute")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(240)
    got = {
        tuple(r)
        for r in spark.sql("select * from sess_stream").collect()
        if r["user_id"] != -1
    }
    want = {
        tuple(r)
        for r in sessionize_native(
            spark.createDataFrame(rows, "user_id bigint, ts timestamp"),
            "user_id", "ts", "30 minutes",
        ).collect()
    }
    assert got == want and len(want) == 3


def test_stream_sessionize_merges_across_restarts(spark, tmp_path):
    """Session state survives a checkpointed restart: events of ONE
    session split across two runs merge into a single emitted row."""
    from datetime import datetime, timedelta

    from ontology_mapper_spark.streaming.stateful import stream_sessionize

    base = datetime(2024, 3, 1, 12, 0, 0)
    src = tmp_path / "sess_src2"
    ckpt = str(tmp_path / "sess_ckpt2")
    sink = str(tmp_path / "sess_out2")
    src.mkdir()
    out_schema = (
        "user_id bigint, session_start string, session_last string, "
        "n_events bigint"
    )

    def run(name):
        # memory sink can't recover from a checkpoint; a file sink can —
        # which is also the restart story a real deployment uses.
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 100)
            .parquet(str(src))
        )
        out = stream_sessionize(
            stream, gap="30 minutes", watermark="1 minute"
        )
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(240)
        return spark.read.schema(out_schema).parquet(sink).collect()

    spark.createDataFrame(
        [(1, base), (1, base + timedelta(minutes=10))],
        "user_id bigint, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(str(src))
    first = run("sess_r1")
    assert first == []  # session still open — nothing emitted

    spark.createDataFrame(
        [(1, base + timedelta(minutes=20)), (-1, base + timedelta(days=30))],
        "user_id bigint, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(str(src))
    second = [r for r in run("sess_r2") if r["user_id"] != -1]
    assert len(second) == 1
    assert second[0]["n_events"] == 3  # all three events, ONE merged session
    assert second[0]["session_start"].startswith("2024-03-01 12:00:00")
    assert second[0]["session_last"].startswith("2024-03-01 12:20:00")
