from .attribution import stream_last_touch
from .cdc import (
    cdc_snapshot_sink,
    compact_snapshot,
    read_snapshot,
    read_snapshot_versioned,
    start_cdc_maintenance,
    vacuum_snapshot,
)
from .detect import (
    read_transcript_stream,
    stream_comention_edges,
    stream_detect_mentions,
    stream_exact_dedup,
    stream_link_mentions,
    stream_scrub,
    stream_windowed_comention_counts,
    windowed_mention_counts,
)

__all__ = [
    "cdc_snapshot_sink",
    "stream_last_touch",
    "compact_snapshot",
    "read_snapshot",
    "read_snapshot_versioned",
    "read_transcript_stream",
    "start_cdc_maintenance",
    "stream_comention_edges",
    "stream_detect_mentions",
    "stream_exact_dedup",
    "stream_link_mentions",
    "stream_scrub",
    "stream_windowed_comention_counts",
    "windowed_mention_counts",
    "vacuum_snapshot",
]
