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
    media: DataFrame, dim: int = 8, use_fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow batches).

    With use_fake=False this raises NotImplementedError per payload —
    clearly marking the decode boundary.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                vec = (
                    deterministic_fake_features(raw, dim)
                    if use_fake
                    else _decode_real(raw, kind)
                )
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
