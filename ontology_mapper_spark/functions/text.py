"""JVM-side (codegen'd) Column expressions for the reference's text ops.

Every expression here is pure `pyspark.sql.functions` — no Python UDFs —
so it stays inside whole-stage codegen and runs identically on a cluster.
Semantics mirror ontology_mapper_spark.oracle.semantics (tests assert parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same order as oracle.semantics.STOCK_PREFIXES — Java regex alternation is
# leftmost-alternative-first, which matches the reference's sequential
# startswith+break loop (/root/reference/utils/helpers.py:17-26).
_PREFIX_RE = (
    "^(A |An |The |This is a |This is an |This is the |Definition: |Description: )"
)


def norm_label_col(c: Column) -> Column:
    """lower(trim(x)) — comparator/cache normalization (comparator.py:27-28)."""
    return F.lower(F.trim(c))


def capitalize_first_col(c: Column) -> Column:
    """Upper-case the first character, preserve the rest (helpers.py:29-30)."""
    return F.concat(F.upper(c.substr(1, 1)), c.substr(F.lit(2), F.length(c)))


def clean_description_col(c: Column) -> Column:
    """Native-expression port of clean_description (helpers.py:8-36).

    whitespace squeeze -> strip first stock prefix -> capitalize first char
    -> truncate >200 chars to 197+'...'. Null/empty input -> ''.

    Known fidelity bound: the squeeze uses Java's ASCII `\\s+`, while the
    reference's ``" ".join(text.split())`` also splits on Unicode
    whitespace (NBSP, ideographic space, \\x1c-\\x1f). The two agree on all
    ASCII text (which is what the oracle gate exercises); Java's
    `(?U)\\s` would NOT close the gap exactly either (Character
    .isWhitespace excludes NBSP), so we keep the simpler ASCII form and
    document the bound instead of pretending unicode parity.
    """
    s = F.coalesce(c, F.lit(""))
    squeezed = F.trim(F.regexp_replace(s, r"\s+", " "))
    stripped = F.regexp_replace(squeezed, _PREFIX_RE, "")
    capped = capitalize_first_col(stripped)
    return F.when(
        F.length(capped) > 200, F.concat(F.substring(capped, 1, 197), F.lit("..."))
    ).otherwise(capped)


def evidence_window_col(
    text,
    begin,
    end,
    window: int = 25,
):
    """±window-char evidence snippet around a [begin, end) mention span.

    Returns a struct (evidence, clipped_left, clipped_right) — the
    provenance snippet a KG stores next to each link so curators can
    audit a mapping without re-reading the turn.  Pure column
    arithmetic (map-only); at scale the text column should ride along
    from detection via detect_mentions(carry_cols=("text",)) so no
    re-join against the transcript table is needed.
    """
    ctx_begin = F.greatest(begin - window, F.lit(0))
    ctx_end = F.least(end + window, F.length(text))
    return F.struct(
        F.substring(text, ctx_begin + 1, ctx_end - ctx_begin).alias("evidence"),
        (begin - window < 0).alias("clipped_left"),
        (end + window > F.length(text)).alias("clipped_right"),
    )
