#!/usr/bin/env python
"""Batch-mode enrichment: selections JSON → triples + SSSOM/CSV/NT exports
(the reference's `--batch-mode` flow, cli/interface.py:303-304, end to end
as one Spark job).

    python examples/enrich_from_selections.py selections.json /tmp/enriched
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontology_mapper_spark.pipeline.from_selections import (  # noqa: E402
    triples_from_selections,
)
from ontology_mapper_spark.session import get_spark  # noqa: E402
from ontology_mapper_spark.sinks import (  # noqa: E402
    write_ntriples,
    write_sssom,
    write_tabular,
)
from ontology_mapper_spark.sources import read_selections_json  # noqa: E402


def main() -> int:
    sel_path, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark(app_name="enrich", master="local[4]")
    selections = read_selections_json(spark, sel_path)
    triples = triples_from_selections(selections, run_ts="1970-01-01T00:00:00")
    triples.write.mode("overwrite").parquet(os.path.join(out_dir, "triples"))
    write_ntriples(triples, os.path.join(out_dir, "nt"))
    write_tabular(triples, os.path.join(out_dir, "csv"))
    write_sssom(triples, os.path.join(out_dir, "sssom"), mapping_date="1970-01-01")
    print(f"wrote {triples.count()} triples to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
