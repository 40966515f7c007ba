#!/usr/bin/env python
"""Trickle-ingest demo: grow the transcript corpus, re-detect only the
changed conv_id buckets (delta-proportional cost).

    python examples/incremental_ingest.py /tmp/inc_mentions
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_mapper_spark.datagen import build_snapshot, build_transcripts  # noqa: E402
from ontology_mapper_spark.datagen.snapshot import ontology_terms_rows  # noqa: E402
from ontology_mapper_spark.pipeline import build_dictionary  # noqa: E402
from ontology_mapper_spark.pipeline.incremental import incremental_detect  # noqa: E402
from ontology_mapper_spark.session import get_spark  # noqa: E402


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/inc_mentions"
    spark = get_spark(app_name="incremental-ingest", master="local[4]")
    terms, _ = build_snapshot(spark, n_terms=100, seed=42)
    labels = sorted({r["label"] for r in ontology_terms_rows(100, 42)})
    pats = build_dictionary(terms)

    for n_convs in (200, 200, 260):  # batch 2 is a no-op, batch 3 a delta
        tr = build_transcripts(spark, n_convs=n_convs, seed=42, mention_labels=labels)
        res = incremental_detect(spark, tr, pats, out, buckets=32)
        print(json.dumps({"n_convs": n_convs, **res}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
