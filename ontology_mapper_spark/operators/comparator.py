"""Source-comparison operator (J1/J2/A1/A2 — services/comparator.py:14-71).

The reference compares BioPortal-vs-OLS result lists per concept by building
two label-keyed dicts and set-intersecting the keys. Distributed form: one
inner join (common terms + uri_match flag) and two left-anti joins
(source-only rows), all on the normalized label key — broadcastable when one
side is dictionary-sized, shuffle-hash otherwise (Catalyst picks via AQE).

Dict-semantics caveat reproduced deterministically: the reference's
`{label.lower(): row}` keeps the LAST row per label (insertion order). We
keep `row_number` LAST-wins ordered by a stable tiebreak column so results
are identical under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _last_per_label(df: DataFrame, order_col: str) -> DataFrame:
    w = Window.partitionBy("label_key").orderBy(F.col(order_col).desc())
    return (
        df.withColumn("label_key", F.lower(F.col("label")))
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .drop("_r")
    )


def compare_sources(
    bp: DataFrame,
    ols: DataFrame,
    label_col: str = "label",
    uri_col: str = "uri",
    order_col: str = "uri",
) -> dict[str, DataFrame]:
    """Returns {'common', 'bp_only', 'ols_only'} DataFrames.

    `common` columns: label, bioportal_uri, ols_uri, uri_match.
    """
    bpn = _last_per_label(bp.withColumnRenamed(label_col, "label"), order_col)
    olsn = _last_per_label(ols.withColumnRenamed(label_col, "label"), order_col)

    common = (
        bpn.alias("b")
        .join(olsn.alias("o"), "label_key")
        .select(
            F.col("b.label").alias("label"),
            F.col(f"b.{uri_col}").alias("bioportal_uri"),
            F.col(f"o.{uri_col}").alias("ols_uri"),
            (F.col(f"b.{uri_col}") == F.col(f"o.{uri_col}")).alias("uri_match"),
        )
    )
    bp_only = bpn.join(olsn, "label_key", "left_anti").drop("label_key")
    ols_only = olsn.join(bpn, "label_key", "left_anti").drop("label_key")
    return {"common": common, "bp_only": bp_only, "ols_only": ols_only}


def comparison_counts(
    bp: DataFrame,
    ols: DataFrame,
    label_col: str = "label",
    uri_col: str = "uri",
) -> DataFrame:
    """One-row summary (bioportal/ols/common/bp_only/ols_only/uri_mismatch
    counts) in a SINGLE job: full-outer join on the label key + one
    conditional aggregation — equivalent to counting compare_sources' three
    outputs but without six separate driver actions. Inputs must already be
    unique per label (as the reference's label-keyed dicts are)."""
    b = bp.select(
        F.lower(F.col(label_col)).alias("label_key"),
        F.col(uri_col).alias("_bp_uri"),
    )
    o = ols.select(
        F.lower(F.col(label_col)).alias("label_key"),
        F.col(uri_col).alias("_ols_uri"),
    )
    j = b.join(o, "label_key", "full_outer")
    one = lambda c: F.coalesce(F.sum(F.when(c, 1)), F.lit(0))  # noqa: E731
    has_bp = F.col("_bp_uri").isNotNull()
    has_ols = F.col("_ols_uri").isNotNull()
    return j.agg(
        one(has_bp).alias("bioportal_count"),
        one(has_ols).alias("ols_count"),
        one(has_bp & has_ols).alias("common_count"),
        one(has_bp & ~has_ols).alias("bp_only_count"),
        one(has_ols & ~has_bp).alias("ols_only_count"),
        one(has_bp & has_ols & (F.col("_bp_uri") != F.col("_ols_uri"))).alias(
            "uri_mismatch_count"
        ),
    )


def comparison_report(
    bp: DataFrame,
    ols: DataFrame,
    concept: str,
    label_col: str = "label",
    uri_col: str = "uri",
    order_col: str = "uri",
) -> dict:
    """The reference's full per-concept comparison record
    (services/comparator.py:14-71 / the JSON report sink K4): counts,
    common terms with uri_match, per-source-only rows, and the exact
    discrepancy message strings. Parity with
    oracle.semantics.compare_results is pinned in tests.

    Driver-side by design: one concept's result lists are bounded by the
    per-search cap (max_results*2, core/lookup.py:66), so this is report
    assembly, not a data-scale operator — the distributed pieces are
    compare_sources' joins.
    """
    parts = compare_sources(bp, ols, label_col, uri_col, order_col)
    common_rows = sorted(
        (
            {
                "label": r["label"],
                "bioportal_uri": r["bioportal_uri"],
                "ols_uri": r["ols_uri"],
                "uri_match": r["uri_match"],
            }
            for r in parts["common"].collect()
        ),
        key=lambda d: d["label"].lower(),
    )
    bp_only = sorted(
        (r.asDict() for r in parts["bp_only"].collect()),
        key=lambda d: d["label"].lower(),
    )
    ols_only = sorted(
        (r.asDict() for r in parts["ols_only"].collect()),
        key=lambda d: d["label"].lower(),
    )
    n_bp, n_ols = bp.count(), ols.count()

    discrepancies: list[str] = []
    if n_bp != n_ols:
        discrepancies.append(
            f"Result count differs: BioPortal={n_bp}, OLS={n_ols}"
        )
    if bp_only:
        discrepancies.append(f"BioPortal has {len(bp_only)} unique term(s)")
    if ols_only:
        discrepancies.append(f"OLS has {len(ols_only)} unique term(s)")
    mismatches = [t for t in common_rows if not t["uri_match"]]
    if mismatches:
        discrepancies.append(
            f"{len(mismatches)} common term(s) have different URIs"
        )
    return {
        "concept": concept,
        "bioportal_count": n_bp,
        "ols_count": n_ols,
        "common_terms": common_rows,
        "bioportal_only": bp_only,
        "ols_only": ols_only,
        "discrepancies": discrepancies,
    }
