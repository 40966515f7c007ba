"""URL canonicalization + dedup keys for crawl-derived corpora.

Web-crawl pipelines dedup first by URL, and raw URLs are noisy:
scheme/host case, default ports, `www.`, trailing slashes, fragments
and tracking query parameters all produce distinct strings for the
same resource.  Canonicalization is a pure string normalization — one
map-only Project of JVM regexp/string Columns (the same shape as
operators/pii.py), so it costs a scan at any scale.

Rules (each implementable identically in Java regex and RE2 for the
oracle):
  1. lowercase scheme+host (the part before the first '/' after '://');
  2. drop fragment (#...);
  3. drop known tracking params (utm_*, fbclid, gclid, ref) from the
     query string, dropping the '?' if nothing survives;
  4. strip default ports (:80 http, :443 https);
  5. strip 'www.';
  6. strip ONE trailing slash from a non-root path.

The dedup key additionally strips the scheme entirely (http/https
variants collapse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL Column (rules in module docstring)."""
    u = url
    # 1. lowercase scheme+host (everything before the first '/' after
    #    '://'): lowered head + untouched remainder
    head = F.regexp_extract(u, r"^([a-zA-Z]+://[^/]*)", 1)
    u = F.concat(F.lower(head), F.substr(u, F.length(head) + 1, F.length(u)))
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. tracking params (then tidy separators)
    u = F.regexp_replace(u, _TRACKING + r"&", "")
    u = F.regexp_replace(u, r"[?&]" + _TRACKING + r"$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    # 4. default ports
    u = F.regexp_replace(u, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    # 5. www.
    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")
    # 6. one trailing slash on a non-root path
    u = F.regexp_replace(u, r"(://[^/]+/.+?)/$", r"$1")
    return u


def url_dedup_key(url: Column) -> Column:
    """Scheme-insensitive dedup key: canonical URL minus the scheme."""
    return F.regexp_replace(canonical_url(url), r"^[a-z]+://", "")


def canonicalize_urls(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(id, url, canonical, dedup_key, is_dup_of_earlier): map-only
    canonicalization plus a window-ranked first-seen dedup flag (total
    order on id — never dropDuplicates)."""
    from pyspark.sql import Window

    out = df.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        canonical_url(F.col(url_col)).alias("canonical"),
        url_dedup_key(F.col(url_col)).alias("dedup_key"),
    )
    w = Window.partitionBy("dedup_key").orderBy(id_col)
    return out.withColumn(
        "is_dup_of_earlier", F.row_number().over(w) > 1
    )
