from .detect import (
    read_transcript_stream,
    stream_comention_edges,
    stream_detect_mentions,
    stream_exact_dedup,
    stream_link_mentions,
    stream_windowed_comention_counts,
    windowed_mention_counts,
)

__all__ = [
    "read_transcript_stream",
    "stream_comention_edges",
    "stream_detect_mentions",
    "stream_exact_dedup",
    "stream_link_mentions",
    "stream_windowed_comention_counts",
    "windowed_mention_counts",
]
