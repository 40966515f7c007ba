#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and, where an
`oracle_sql()` entry exists, the oracle on DuckDB over the same parquet
tables; compares row count, sorted column names, and an order-insensitive
canonical value hash. Reports EXACT / FLOAT-NOISE / MISMATCH per query so
float-hashing risks are visible before the driver sees them.

Usage: python tools/check_correctness.py [--sf-dir DIR] [--only substr]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import traceback
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v) -> str:
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, float):  # covers np.float64 (subclass of float)
        if math.isnan(v):
            # pandas renders SQL NULL in a double column as NaN; the driver
            # gate passes q22 (NULL double) so its canonicalizer must equate
            # the two — mimic that, else fetchall-vs-df falsely diverges.
            return "∅"
        return repr(v)
    if isinstance(v, np.floating):
        return canon_cell(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def value_hash(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def float_close(a: str, b: str, rel: float = 1e-9) -> bool:
    try:
        fa, fb = float(a), float(b)
    except ValueError:
        return False
    if fa == fb:
        return True
    return abs(fa - fb) <= rel * max(abs(fa), abs(fb), 1.0)


def rows_close(ra, rb) -> bool:
    if len(ra) != len(rb):
        return False
    for a, b in zip(ra, rb):
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x != y and not float_close(x, y):
                return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip-rows-only", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry_mod
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4, driver_memory="6g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if args.only and not any(
            s and s in name for s in args.only.split(",")
        ):
            continue
        try:
            df = fn(spark, args.sf_dir)
            sp_cols = df.columns
            # Driver parity: the driver hashes BOTH engines through the
            # pandas/Arrow path (proof: q22's nullable-BIGINT column, which
            # pandas promotes to float64 on both sides, was driver-green
            # while q14's int-vs-HUGEINT was driver-red). collect() would
            # render Spark longs as "123" where the driver sees "123.0".
            sp_pdf = df.toPandas()
            sp_rows = [tuple(r) for r in sp_pdf.itertuples(index=False, name=None)]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            if not args.skip_rows_only:
                print(f"rows  {name}: {len(sp_rows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            dk_cols = [d[0] for d in cur.description]
            dk_rows = cur.fetchall()
            # The DRIVER fetches through pandas/Arrow, where e.g. DuckDB
            # HUGEINT (bare integer sum()) lands as float64 and hashes as
            # "123.0" vs Spark's "123". Canonicalize the pandas path too and
            # treat ANY fetchall-vs-df divergence as a failure — this is the
            # exact blind spot that hid q14/q24/q33 for two rounds.
            pdf = con.execute(oracles[name]).df()
            df_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures += 1
            continue
        sc, sr = canon_rows(sp_cols, sp_rows)
        dc, dr = canon_rows(dk_cols, dk_rows)
        dc2, dr2 = canon_rows(list(pdf.columns), df_rows)
        # Advisory: a fetchall-vs-df divergence on the oracle side marks a
        # type that only stays green because Spark's pandas path promotes
        # identically (nullable BIGINT -> float64). The hard failures below
        # use the pandas path on BOTH engines — exactly what the driver
        # hashes — so the q14 HUGEINT class can no longer hide locally.
        if dc != dc2 or value_hash(dr) != value_hash(dr2):
            print(f"note  {name}: oracle fetchall vs .df() renderings differ "
                  f"(pandas-path promotion); driver compares pandas-vs-pandas")
        dr = dr2
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            for r in sr[:3]:
                print("   spark:", r)
            for r in dr[:3]:
                print("   duck :", r)
            failures += 1
            continue
        if value_hash(sr) == value_hash(dr):
            print(f"OK    {name}: {len(sr)} rows exact")
        elif rows_close(sr, dr):
            print(f"NOISE {name}: {len(sr)} rows equal only within float tolerance — "
                  f"driver hash WILL differ; fix to exact arithmetic")
            failures += 1
        else:
            print(f"FAIL  {name}: value mismatch")
            diff_shown = 0
            for a, b in zip(sr, dr):
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
                    diff_shown += 1
                    if diff_shown >= 3:
                        break
            failures += 1
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
