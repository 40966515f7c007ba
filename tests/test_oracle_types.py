"""Mechanical enforcement of the oracle type-portability rules.

The driver fetches DuckDB oracle results through pandas/Arrow, where some
DuckDB types change rendering vs native Python fetch:

* HUGEINT (the type of a bare integer ``sum()``) -> float64 -> "123.0"
* DECIMAL -> float64 or object-Decimal depending on width
* TIMESTAMP/DATE -> pandas Timestamp (isoformat differs from date str)

contract.py's docstring states the casting rules (cast sums to BIGINT,
timestamps out as formatted strings, micro-fixed-point for interpolated
values); this test enforces them mechanically over every ``oracle_sql()``
entry by asking DuckDB for each query's output column types (lazily, via
relation ``.types`` — no execution) and asserting every column is in the
portable set. This is the regression gate for the q14/q24/q33 driver-red
class that survived rounds 1-2.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Scalar types whose canonical string rendering is identical through
# DuckDB fetchall() and through pandas .df() (numpy) — verified in
# tools/check_correctness.py's dual-path hash.
PORTABLE_SCALARS = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
}

# Explicitly non-portable: driver's pandas path renders these differently
# from fetchall and/or from Spark's collect().
FORBIDDEN_MARKERS = ("HUGEINT", "DECIMAL", "TIMESTAMP", "DATE", "TIME", "UUID",
                     "STRUCT", "MAP", "INTERVAL", "BLOB")


def _portable(type_str: str) -> bool:
    base = type_str.strip()
    # unwrap LIST nesting: portable lists of portable scalars are fine
    # (both fetch paths yield element-wise identical canonical strings).
    while base.endswith("[]"):
        base = base[:-2]
    return base in PORTABLE_SCALARS


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_output_type_is_portable(con):
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle_sql() is empty?"
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if not _portable(ts):
                bad.append(f"{name}.{col}: {ts}")
    assert not bad, (
        "Non-portable oracle output types (cast at the top level — "
        "sums to BIGINT, timestamps/dates to formatted strings, "
        "decimals to DOUBLE):\n  " + "\n  ".join(bad)
    )


def test_forbidden_markers_cover_known_failure_modes():
    # Guard the guard: every marker the driver is known to mangle must be
    # classified non-portable by _portable().
    for m in FORBIDDEN_MARKERS:
        assert not _portable(m)
    # And a bare integer sum() really is HUGEINT in this DuckDB build.
    t = str(duckdb.sql("SELECT sum(x) FROM (SELECT 1 AS x)").types[0])
    assert t == "HUGEINT"
