"""Unicode NFC normalization + control-character scrub.

Web-crawl text mixes composed and decomposed codepoint sequences for
the same glyph (``é`` vs ``e`` + U+0301), which silently breaks exact
dedup, mention detection, and tokenization; stray C0 control bytes
break downstream serializers.  This is the canonical first scrub stage
of a corpus pipeline, before any hashing or KG work.

Scale design — Python only where it can matter:

* Spark has no built-in Unicode normalizer, so NFC needs Python
  (``unicodedata.normalize``, Arrow-batched pandas UDF).  But NFC is
  the identity on pure-ASCII text, which dominates web corpora.  A
  ``F.when`` around a pandas UDF does NOT skip evaluation (Catalyst
  extracts Python UDFs into an unconditional ArrowEvalPython node), so
  the fast path is a genuine plan split: ``rlike '[^\\x00-\\x7F]'``
  routes suspect rows through the UDF and ASCII rows through a pure
  JVM branch, reunited with ``unionByName``.  At 100 TB the Python
  lane sees only the (typically small) non-ASCII fraction; both lanes
  are map-only, and the union adds no shuffle.
* The C0 control strip ([\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F] — tab/LF/CR
  survive) is a JVM ``regexp_replace`` on every row, applied BEFORE
  NFC on both lanes so the two lanes compose the same function.

Oracle: DuckDB's ``nfc_normalize`` (utf8proc) and Python's
``unicodedata`` both implement UAX #15 NFC, so the cleaned strings
hash identically.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls except tab/newline/carriage-return
_CTRL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
_NON_ASCII = "[^\\x00-\\x7F]"


def _nfc_udf():
    # defined lazily: @pandas_udf resolves its return type against the
    # active session, so a module-scope decorator breaks bare imports
    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc


def strip_controls(text: Column) -> Column:
    """Drop C0 control characters (keeping tab/LF/CR) — pure JVM."""
    return F.regexp_replace(text, _CTRL, "")


def nfc_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, clean, n_raw, n_ctrl, n_clean, changed) per row.

    ``clean`` = NFC(control-stripped text); ``n_ctrl`` counts removed
    control chars, ``changed`` flags any difference from the raw text.
    Suspect (non-ASCII) rows go through the Arrow NFC lane, ASCII rows
    through a JVM-only lane — see module docstring.
    """
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        t.alias("_raw"),
        strip_controls(t).alias("_stripped"),
        # null text must still land in exactly one lane (rlike(null)=null
        # would drop the row from BOTH filters)
        F.coalesce(t.rlike(_NON_ASCII), F.lit(False)).alias("_suspect"),
    )
    ascii_lane = base.where(~F.col("_suspect")).select(
        F.col(id_col), "_raw", F.col("_stripped").alias("clean")
    )
    nfc_lane = base.where(F.col("_suspect")).select(
        F.col(id_col), "_raw", _nfc_udf()(F.col("_stripped")).alias("clean")
    )
    out = ascii_lane.unionByName(nfc_lane)
    return out.select(
        F.col(id_col),
        "clean",
        F.length("_raw").alias("n_raw"),
        (F.length("_raw") - F.length(strip_controls(F.col("_raw"))))
        .alias("n_ctrl"),
        F.length("clean").alias("n_clean"),
        (F.col("clean") != F.col("_raw")).alias("changed"),
    )
