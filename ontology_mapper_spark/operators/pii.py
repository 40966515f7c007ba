"""PII detection / redaction over text columns.

Training-data pipelines scrub personally-identifiable strings before
anything else touches the corpus (the reference has no analogue — it
maps curated ontology terms — but any transcript corpus fed to the KG
pipeline at 10^12-turn scale needs this stage first).  Spark-first:
every pattern is a JVM-side `regexp_*` Column expression — one map-only
pass, no shuffle, no Python, trivially parallel at any scale.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle): character classes, bounded repetition
and ``\\b`` word boundaries only — no backreferences, no lookaround —
so the oracle runs the byte-identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: replacement happens in this order, so earlier patterns must
# not produce text that later patterns re-match (the tokens are <UPPER>
# with no digits/dots, so they never do).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts as integer Columns (regexp_count, JVM-side)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact(text: Column) -> Column:
    """Replace every PII match with its typed placeholder token."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """id + per-kind counts + redacted text + chars-removed.

    Map-only: the plan is a single Project over the scan — verify with
    .explain (no Exchange, no Python).  Counts use the SAME patterns as
    the replacement, so ``n_redacted_chars == 0`` iff all counts are 0.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    red = redact(t)
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        red.alias("redacted"),
        (F.length(t) - F.length(red)).cast("long").alias("delta_chars"),
    )
