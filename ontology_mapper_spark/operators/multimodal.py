"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libs in this container —
`NotImplementedError` behind an import-try, with a deterministic fake used
by tests); the Spark-side plumbing is real: schema, Arrow batch shape,
`mapInPandas` signatures, and partition sizing are exactly what a decode
UDF needs at scale.

Scale notes: binary payloads dominate partition bytes — size
`spark.sql.files.maxPartitionBytes` so one task holds O(100) payloads, and
always project metadata-only when the payload isn't needed (column pruning
keeps the binary column unread in parquet).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_real(payload: bytes, kind: str):
    """Real decode would go through PIL/libav — unavailable here."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; use deterministic_fake_features for tests"
    )


def deterministic_fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Stand-in 'embedding': byte histogram folded to `dim` buckets —
    deterministic, so tests can assert exact values."""
    buckets = [0] * dim
    for i, byte in enumerate(payload or b""):
        buckets[byte % dim] += 1
    total = max(sum(buckets), 1)
    return [b / total for b in buckets]


def extract_media_features(
    media: DataFrame,
    dim: int = 8,
    use_fake: bool = True,
    decode_fn=None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).

    The decode boundary is DEPENDENCY-INJECTED: pass
    ``decode_fn(payload: bytes, kind: str) -> list[float]`` and a real
    cluster plugs PIL/libav/torchaudio without touching engine code —
    the function is closure-serialized to executors and called once per
    payload inside the Arrow batch loop.  Without ``decode_fn``,
    ``use_fake=True`` (default) uses the deterministic byte-histogram
    stand-in (oracled by q40) and ``use_fake=False`` raises
    NotImplementedError per payload — clearly marking the boundary.
    """
    if decode_fn is None:
        decode_fn = (
            (lambda payload, kind: deterministic_fake_features(payload, dim))
            if use_fake
            else _decode_real
        )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                vec = [float(x) for x in decode_fn(raw, kind)]
                feats.append((int(mid), kind, len(raw), vec))
            yield pd.DataFrame(
                feats, columns=["media_id", "kind", "n_bytes", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows — the
    pure-relational part of frame extraction (the decode itself is the
    stubbed boundary). sequence() keeps it JVM-side."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def resize_plan(
    media: DataFrame, max_side: int = 512, multiple_of: int = 8
) -> DataFrame:
    """Image-resize *plan*: (media_id, width, height, target_w, target_h,
    scale_micro) — the aspect-preserving target geometry a decode UDF
    would apply, as pure integer/one-division Column math (JVM-side).

    Policy: scale the LONG side down to ≤ max_side (never upscale), then
    snap both targets down to a multiple of `multiple_of` (vision-encoder
    patch alignment), floor ≥ multiple_of. NULL dimensions pass through
    with NULL targets (the decode stage fills them post-probe).
    """
    w, h = F.col("width"), F.col("height")
    long_side = F.greatest(w, h)
    scale = F.when(long_side > max_side, max_side / long_side).otherwise(
        F.lit(1.0)
    )

    def snap(c):
        raw = F.floor(c * scale / multiple_of) * multiple_of
        return F.greatest(raw, F.lit(multiple_of)).cast("int")

    has_dims = w.isNotNull() & h.isNotNull()
    return media.where(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.when(has_dims, snap(w)).alias("target_w"),
        F.when(has_dims, snap(h)).alias("target_h"),
        F.when(has_dims, F.round(scale * 1e6).cast("bigint")).alias(
            "scale_micro"
        ),
    )


def audio_chunk_plan(
    media: DataFrame, chunk_ms: int = 30_000, overlap_ms: int = 0
) -> DataFrame:
    """Audio-chunking *plan*: (media_id, chunk_idx, start_ms, end_ms) —
    fixed windows with optional overlap over duration_ms (the relational
    half of a Whisper-style segmenter; decode is the stubbed boundary).
    The final chunk is clipped to the duration; zero-duration rows yield
    no chunks."""
    step = chunk_ms - overlap_ms
    if step <= 0:
        raise ValueError("overlap_ms must be smaller than chunk_ms")
    dur = F.coalesce(F.col("duration_ms"), F.lit(0))
    starts = F.sequence(
        F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(step)
    )
    return (
        media.where((F.col("kind") == "audio") & (dur > 0))
        .select(
            "media_id",
            dur.alias("_dur"),
            F.posexplode(starts).alias("chunk_idx", "start_ms"),
        )
        .where(F.col("start_ms") < F.col("_dur"))
        .select(
            "media_id",
            "chunk_idx",
            "start_ms",
            F.least(F.col("start_ms") + chunk_ms, F.col("_dur")).alias("end_ms"),
        )
    )
