"""Multiple-testing corrections + power analysis over per-group tests.

A per-group hypothesis family (one z-test per event type / source /
shard — operators/stats.py:one_vs_rest_ztests) false-positives at
~alpha·m without correction; these operators apply the two standard
fixes — Holm step-down (FWER) and Benjamini-Hochberg step-up (FDR) —
plus the prospective view: the per-arm sample size a two-proportion
test NEEDS to detect the observed lift.

Exactness discipline (the qa89/qa95 constant-injection technique): no
engine ever evaluates a normal quantile.  All critical values are
computed ONCE in Python via `statistics.NormalDist` (stdlib, correctly
rounded enough to be reproducible on one machine — and identical by
construction across engines because BOTH sides consume the same
integer-micro literals: Spark as a broadcast table, DuckDB as a VALUES
list from the same generator).  Test statistics are compared against
the injected crit² values in pure int64.

Scale shape: everything after the per-group aggregate runs on the
GROUP dimension (m rows); windows over it are bounded by construction
(documented in tools/dump_plans.py's allowlist).
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000

#: z for alpha=0.05 two-sided and power=0.8, full-precision doubles —
#: injected into both engines as decimal literals (same parse → same
#: IEEE double), never computed engine-side
Z_ALPHA_05_TWOSIDED = NormalDist().inv_cdf(1 - 0.05 / 2)
Z_BETA_080 = NormalDist().inv_cdf(0.8)


def holm_crit_rows(max_m: int = 32, alpha_micro: int = 50_000) -> list[tuple[int, int]]:
    """(d, crit2_micro) for Holm divisors d = m-k+1 in 1..max_m:
    crit2 = z²(1 - alpha/(2d))·1e6, two-sided."""
    a = alpha_micro / MICRO
    out = []
    for d in range(1, max_m + 1):
        z = NormalDist().inv_cdf(1 - a / (2 * d))
        out.append((d, round(z * z * MICRO)))
    return out


def bh_crit_rows(
    max_m: int = 32, alpha_micro: int = 50_000
) -> list[tuple[int, int, int]]:
    """(m, k, crit2_micro) for BH thresholds alpha·k/m, k<=m<=max_m,
    two-sided: crit2 = z²(1 - (alpha·k/m)/2)·1e6."""
    a = alpha_micro / MICRO
    out = []
    for m in range(1, max_m + 1):
        for k in range(1, m + 1):
            z = NormalDist().inv_cdf(1 - (a * k / m) / 2)
            out.append((m, k, round(z * z * MICRO)))
    return out


def _ranked(tests: DataFrame, group_col: str, z2_col: str) -> DataFrame:
    """rank tests by evidence (z² desc = p asc; NULL z² ranks last and
    never rejects) over the m-row test table, with m as a wall count."""
    w = Window.orderBy(
        F.col(z2_col).desc_nulls_last(), F.col(group_col)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return tests.select(
        F.col(group_col).alias("_g"),
        F.col(z2_col).alias("_z2"),
        F.row_number().over(w).cast("int").alias("rank"),
        F.count("*").over(wall).cast("int").alias("_m"),
    )


def holm_rejections(
    tests: DataFrame,
    group_col: str,
    z2_col: str = "z2_micro",
    max_m: int = 32,
    alpha_micro: int = 50_000,
) -> DataFrame:
    """Holm step-down FWER correction: walk hypotheses strongest-first,
    compare p_k against alpha/(m-k+1), STOP at the first failure (every
    later hypothesis is not rejected even if its own bar would pass).
    The step-down walk is a running boolean AND over the rank window.

    Requires m <= max_m (in-plan guard raises otherwise — never a
    silent drop).  Output per test: group, z2_micro, rank, crit2_micro,
    reject.
    """
    crit = tests.sparkSession.createDataFrame(
        holm_crit_rows(max_m, alpha_micro), "d int, crit2_micro long"
    )
    r = _ranked(tests, group_col, z2_col).withColumn(
        "_d",
        F.when(
            F.col("_m") <= max_m, F.col("_m") - F.col("rank") + 1
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"holm_rejections: m exceeds max_m={max_m}: m="),
                    F.col("_m").cast("string"),
                )
            )
        ),
    )
    joined = r.join(F.broadcast(crit), r["_d"] == crit["d"]).select(
        "_g", "_z2", "rank", "crit2_micro",
        (F.col("_z2").isNotNull() & (F.col("_z2") >= F.col("crit2_micro")))
        .cast("int")
        .alias("_pass"),
    )
    wcum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("_g").alias(group_col),
        F.col("_z2").alias(z2_col),
        "rank",
        "crit2_micro",
        (F.min("_pass").over(wcum) == 1).alias("reject"),
    )


def bh_rejections(
    tests: DataFrame,
    group_col: str,
    z2_col: str = "z2_micro",
    max_m: int = 32,
    alpha_micro: int = 50_000,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction: find the LARGEST k
    with p_k <= alpha·k/m and reject ranks 1..k — a running boolean OR
    from the weakest rank upward.  Same injected-crit² discipline and
    m <= max_m guard as Holm.  Output per test: group, z2_micro, rank,
    crit2_micro, reject.
    """
    crit = tests.sparkSession.createDataFrame(
        bh_crit_rows(max_m, alpha_micro), "m int, k int, crit2_micro long"
    )
    r = _ranked(tests, group_col, z2_col).withColumn(
        "_mg",
        F.when(F.col("_m") <= max_m, F.col("_m")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"bh_rejections: m exceeds max_m={max_m}: m="),
                    F.col("_m").cast("string"),
                )
            )
        ),
    )
    joined = r.join(
        F.broadcast(crit),
        (r["_mg"] == crit["m"]) & (r["rank"] == crit["k"]),
    ).select(
        "_g", "_z2", "rank", "crit2_micro",
        (F.col("_z2").isNotNull() & (F.col("_z2") >= F.col("crit2_micro")))
        .cast("int")
        .alias("_pass"),
    )
    wup = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.col("_g").alias(group_col),
        F.col("_z2").alias(z2_col),
        "rank",
        "crit2_micro",
        (F.max("_pass").over(wup) == 1).alias("reject"),
    )


def required_n_two_proportions(
    df: DataFrame,
    group_col: str,
    hit_col,
) -> DataFrame:
    """Per-group prospective power analysis: the per-arm sample size a
    two-proportion test (alpha=0.05 two-sided, power=0.8) needs to
    detect the group-vs-rest rate difference actually observed — the
    "is this A/B even worth running at this effect size" planner.

        n = ceil( (z_a·sqrt(2·p̄·(1-p̄)) + z_b·sqrt(p1·q1 + p2·q2))²
                  / (p1 - p2)² ),   p̄ = (p1+p2)/2

    p1, p2 are single divisions of exact counts; every subsequent
    double op is in one fixed mirrored order; z constants are injected
    decimal literals (same parse → same IEEE double in both engines).
    The p1 = p2 degenerate case is detected in EXACT integers
    (r·(N-n) == (R-r)·n) → NULL.

    Output per group: group, n, n_hits, p1_micro, p2_micro, n_required.
    """
    h = (
        hit_col if not isinstance(hit_col, str) else F.col(hit_col)
    ).cast("boolean").cast("long")
    per = df.select(F.col(group_col).alias("_g"), h.alias("_h")).groupBy(
        "_g"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_h").cast("long").alias("n_hits"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("_N"),
        F.sum("n_hits").cast("long").alias("_R"),
    )
    s = per.crossJoin(F.broadcast(tot))
    p1 = F.col("n_hits").cast("double") / F.col("n").cast("double")
    p2 = (F.col("_R") - F.col("n_hits")).cast("double") / (
        F.col("_N") - F.col("n")
    ).cast("double")
    pbar = (p1 + p2) / F.lit(2.0)
    za = F.lit(float(Z_ALPHA_05_TWOSIDED))
    zb = F.lit(float(Z_BETA_080))
    root = za * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar)) + zb * F.sqrt(
        p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2)
    )
    n_req = F.ceil((root * root) / ((p1 - p2) * (p1 - p2))).cast("long")
    same = (
        F.col("n_hits") * (F.col("_N") - F.col("n"))
        == (F.col("_R") - F.col("n_hits")) * F.col("n")
    )
    return s.select(
        F.col("_g").alias(group_col),
        "n",
        "n_hits",
        F.round(p1 * MICRO).cast("long").alias("p1_micro"),
        F.round(p2 * MICRO).cast("long").alias("p2_micro"),
        F.when(
            ~same & (F.col("n") > 0) & (F.col("_N") > F.col("n")), n_req
        ).alias("n_required"),
    )
