#!/usr/bin/env python
"""Deterministic sf1-scale dataset builder (VERDICT r4 item 4).

The driver ships sf0.001/0.01/0.1 only; the round-4 inference ops lean
on bounded-dimension spines (value histograms, calendar spines, bin
lattices — 84 allowlisted windows in tools/dump_plans.py), and the open
question is whether those spines stay bounded when the corpus grows
10x.  This tool tiles sf0.1 ten times with deterministic key shifts
into /tmp/omx_sf1 (~6M lineitem rows, the sf1 shape):

  * every entity id (doc, vec, event, user, order, part, supp, cust)
    is offset per copy — id-keyed domains genuinely grow 10x;
  * value/text/timestamp columns are left as-is — value-histogram
    domains grow only through the id mixes, matching the "domain grows
    sublinearly in rows" reality the allowlist justifications assume
    (the sweep MEASURES those domains rather than trusting this).

Pure pyarrow (no Spark session), seedless and reproducible: copy k's
shift is a fixed multiple of a power of ten well above the sf1 key
range.  Output is read-only input for tools/sf1_window_sweep.py.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("OMX_SF1_DIR", "/tmp/omx_sf1")
COPIES = 10

# per-table: {column: per-copy offset}
SHIFTS: dict[str, dict[str, int]] = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 1_000_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "customer": {"c_custkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "nation": {},
    "region": {},
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    for name, shifts in SHIFTS.items():
        src = os.path.join(SRC, f"{name}.parquet")
        t = pq.read_table(src)
        if not shifts:
            pq.write_table(t, os.path.join(DST, f"{name}.parquet"))
            print(f"{name}: copied {t.num_rows}")
            continue
        parts = []
        for k in range(COPIES):
            cols = []
            for field in t.schema:
                col = t[field.name]
                if field.name in shifts and k > 0:
                    col = pc.add(
                        col, pa.scalar(k * shifts[field.name], type=field.type)
                    )
                cols.append(col)
            parts.append(pa.table(dict(zip(t.schema.names, cols))))
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(DST, f"{name}.parquet"), row_group_size=1 << 20
        )
        print(f"{name}: {t.num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
