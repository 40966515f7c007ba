"""Deterministic synthetic multi-turn transcript table (BASELINE.json:input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string nullable, ts timestamp) — monotone ts within a conversation.

Two generators with IDENTICAL output for the same (seed, n_convs):

* ``transcripts_rows``  — pure Python, for unit tests at tiny scale;
* ``build_transcripts`` — distributed: ``spark.range(n_convs)`` +
  ``mapInPandas``, one pandas batch per id-range partition, each
  conversation seeded by ``hash(seed, conv_index)``. This is the
  scale-correct path: generation is embarrassingly parallel, no driver-side
  materialization, no shuffle, and output is a pure function of the seed
  regardless of partitioning (the per-conv RNG does not cross rows).

Turn text is filler sentences with *planted* ontology-term mentions (exact,
case-variant, multi-word) at a seeded rate, with a skew knob: the hot term's
label accounts for a large share of mentions, so downstream joins and
groupBys see realistic hot keys (FIXTURES.md §1).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Iterable

_FILLER = (
    "please", "check", "the", "report", "and", "summarize", "findings",
    "for", "our", "weekly", "sync", "then", "update", "tracker", "with",
    "status", "notes", "before", "tomorrow", "meeting", "thanks", "also",
    "review", "open", "items", "from", "last", "week",
)
_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "browser", "calculator", "db_query")

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _conv_rows(
    conv_index: int,
    seed: int,
    mention_labels: list[str],
    hot_label: str,
    mention_rate: float,
    hot_share: float,
    mean_turns: int,
) -> list[tuple]:
    """Rows for one conversation — pure function of (seed, conv_index)."""
    rng = random.Random((seed << 20) ^ conv_index)
    conv_id = f"conv_{conv_index:08d}"
    n_turns = 1 + min(int(rng.expovariate(1.0 / mean_turns)), mean_turns * 6)
    t0 = _EPOCH + timedelta(seconds=conv_index % 86400)
    rows = []
    for turn_idx in range(n_turns):
        role = _ROLES[turn_idx % 2] if rng.random() > 0.15 else "tool"
        tool = rng.choice(_TOOLS) if role == "tool" else None
        words = [rng.choice(_FILLER) for _ in range(rng.randrange(4, 18))]
        if rng.random() < mention_rate and mention_labels:
            label = (
                hot_label
                if rng.random() < hot_share
                else mention_labels[rng.randrange(len(mention_labels))]
            )
            if rng.random() < 0.25:
                label = label.upper()  # case-variant mention
            pos = rng.randrange(len(words) + 1)
            words.insert(pos, label)
        ts = t0 + timedelta(seconds=turn_idx * (30 + rng.randrange(90)))
        rows.append((conv_id, turn_idx, role, " ".join(words), tool, ts))
    return rows


def transcripts_rows(
    n_convs: int = 50,
    seed: int = 42,
    mention_labels: list[str] | None = None,
    hot_label: str = "pain",
    mention_rate: float = 0.45,
    hot_share: float = 0.35,
    mean_turns: int = 8,
) -> list[tuple]:
    labels = mention_labels if mention_labels is not None else [hot_label]
    out: list[tuple] = []
    for i in range(n_convs):
        out.extend(
            _conv_rows(i, seed, labels, hot_label, mention_rate, hot_share, mean_turns)
        )
    return out


def transcripts_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )


def build_transcripts(
    spark,
    n_convs: int = 1000,
    seed: int = 42,
    mention_labels: list[str] | None = None,
    hot_label: str = "pain",
    mention_rate: float = 0.45,
    hot_share: float = 0.35,
    mean_turns: int = 8,
    partitions: int | None = None,
):
    """Distributed generation: no driver materialization, no shuffle."""
    import pandas as pd

    labels = mention_labels if mention_labels is not None else [hot_label]
    schema = transcripts_schema()
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for conv_index in pdf["id"].tolist():
                rows.extend(
                    _conv_rows(
                        int(conv_index), seed, labels, hot_label,
                        mention_rate, hot_share, mean_turns,
                    )
                )
            yield pd.DataFrame(rows, columns=list(TRANSCRIPT_COLUMNS))

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=schema)
    )
