"""Relational reshape: pivot (long → wide counts matrix).

The reference renders per-ontology/per-service count tables for its
comparison reports (ontology_mapper compare output; SURVEY.md §2 A1/A2
family) — the wide form of that is a pivot.  At 100 TB the ONLY safe
pivot is one with DECLARED column values: Spark's two-argument
`pivot(col)` first runs a distinct-scan over the pivot column to
discover values (an extra full pass, and an unbounded-width schema if
the column has high cardinality).  `pivot(col, values)` skips the scan
and compiles to a single hash aggregate with one conditional-count per
declared value — same shape as a manual `count(CASE WHEN …)` fan-out,
one shuffle, map-side partial aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_count_matrix(
    df: DataFrame,
    row_col: str,
    col_col: str,
    col_values: Sequence[str],
) -> DataFrame:
    """Counts matrix: one row per `row_col` value, one LONG column per
    DECLARED `col_values` entry (0 when absent), plus `row_total` over
    the declared columns only.

    Declaring the values is the point (see module docstring): the plan
    is a single partial+final hash aggregate — no value-discovery scan,
    no second shuffle — and the output schema is fixed at plan time, so
    downstream code (and the oracle) can bind columns statically.  Rows
    whose `col_col` value is outside the declared set count toward no
    column and not toward `row_total` (a documented contract, mirrored
    by the conditional-count oracle).
    """
    vals = [str(v) for v in col_values]
    p = df.groupBy(row_col).pivot(col_col, vals).count()
    out = [F.col(row_col)]
    total = F.lit(0).cast("long")
    for v in vals:
        c = F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long")
        out.append(c.alias(v))
        total = total + c
    out.append(total.alias("row_total"))
    return p.select(*out)
