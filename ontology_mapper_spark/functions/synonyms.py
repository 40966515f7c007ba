"""Native (no-UDF) replica of the reference's synonym dedup (D3).

Mirrors /root/reference/utils/helpers.py:39-73 bit-exactly as a single
Column expression over an array<string>:

* blank / whitespace-only entries dropped;
* first occurrence of each lower().strip() form wins, keeping the stripped
  original of that FIRST occurrence (order-sensitive — `aggregate` walks
  the array left-to-right, which arrays preserve);
* forms present in `existing` (lowered labels) dropped;
* forms shorter than 3 chars dropped;
* result sorted by (length, lowercase) via array_sort comparator.

Staying in Column expressions keeps this inside whole-stage codegen — it
runs per-row over candidate arrays at mention volume, so a Python UDF here
would be the hottest Python loop in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dedupe_synonyms_col(synonyms: Column, existing: Column | None = None) -> Column:
    existing_arr = existing if existing is not None else F.array().cast("array<string>")
    src = F.coalesce(synonyms, F.array().cast("array<string>"))
    cleaned = F.filter(src, lambda s: F.trim(F.coalesce(s, F.lit(""))) != F.lit(""))

    acc0 = F.struct(
        F.array().cast("array<string>").alias("kept"),
        F.array().cast("array<string>").alias("seen"),
    )

    def step(acc: Column, s: Column) -> Column:
        form = F.lower(F.trim(s))
        keep = (
            (F.length(form) >= 3)
            & ~F.array_contains(acc["seen"], form)
            & ~F.array_contains(existing_arr, form)
        )
        return F.struct(
            F.when(keep, F.concat(acc["kept"], F.array(F.trim(s))))
            .otherwise(acc["kept"])
            .alias("kept"),
            F.when(keep, F.concat(acc["seen"], F.array(form)))
            .otherwise(acc["seen"])
            .alias("seen"),
        )

    kept = F.aggregate(cleaned, acc0, step, lambda acc: acc["kept"])

    def cmp(a: Column, b: Column) -> Column:
        return (
            F.when(F.length(a) < F.length(b), F.lit(-1))
            .when(F.length(a) > F.length(b), F.lit(1))
            .when(F.lower(a) < F.lower(b), F.lit(-1))
            .when(F.lower(a) > F.lower(b), F.lit(1))
            .otherwise(F.lit(0))
        )

    return F.array_sort(kept, cmp)


def top_synonyms_col(synonyms: Column, n: int = 3, existing: Column | None = None) -> Column:
    """D3 + the call-site head-3 slice (core/generator.py:283)."""
    return F.slice(dedupe_synonyms_col(synonyms, existing), 1, n)
