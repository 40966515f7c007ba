"""Privacy auditing for training corpora: k-anonymity / l-diversity
reports and deterministic Laplace-noised release counts.

Before a transcript corpus leaves the pipeline (released stats, shared
slices, eval dumps), two questions recur at 100 TB scale:

* **Re-identification risk** — how many rows sit in quasi-identifier
  equivalence classes smaller than k, and do small classes also expose
  a sensitive attribute (l-diversity)?  One groupBy on the QI columns
  answers both; everything downstream of that single shuffle operates
  on the (small) class table.
* **Noisy release** — published aggregate counts get Laplace noise
  (the standard ε-DP mechanism).  Noise here is DETERMINISTIC: the
  uniform draw comes from md5(seed ∥ group), inverse-CDF'd to a
  Laplace deviate, so reruns — and the DuckDB oracle — reproduce it
  bit-identically.  (A seeded release is what an audited pipeline
  wants anyway: the noise is fixed per release id, not per query.)

Exactness discipline (contract.py header): class sizes, marginals and
risk numerators stay bigint; the uniform is an exact dyadic rational
(48 md5 bits / 2^48); the single ln per group is micro-rounded via the
same fixed double DAG in both engines.

Reference analogue: none — the reference maps curated ontology terms
(utils/helpers.py) and never releases user-level data; this is part of
the transcript-corpus surface the north star adds on top.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000

#: md5 prefix bits used for the uniform draw (fits a BIGINT exactly).
_UBITS = 48


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str | Column],
    sensitive_col: str | Column,
    ks: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier columns.

    One shuffle builds the equivalence-class table (class size n, and
    the class's distinct-sensitive-value count l); the per-k summary is
    a conditional aggregate over that table with the thresholds
    exploded in-plan (|ks| × n_classes intermediate rows, all tiny
    relative to the input).  Nothing after the first groupBy touches
    row-level data, so the audit costs one pass at any corpus size.

    Output, one row per k (ascending): k, n_classes, n_rows,
    classes_below (size < k), rows_below, risk_micro
    (rows_below/n_rows), min_class_size, min_l_diversity (corpus-wide
    min distinct sensitive values in any class — 1 means some class is
    attribute-disclosing regardless of k).
    """
    qs = [c if isinstance(c, Column) else F.col(c) for c in qi_cols]
    classes = (
        df.select(
            *[q.alias(f"_q{i}") for i, q in enumerate(qs)],
            (
                sensitive_col
                if isinstance(sensitive_col, Column)
                else F.col(sensitive_col)
            ).alias("_s"),
        )
        .groupBy(*[f"_q{i}" for i in range(len(qs))])
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.countDistinct("_s").cast("long").alias("_l"),
        )
    )
    per_k = classes.select(
        "_n", "_l", F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k")
    )
    agg = per_k.groupBy("k").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.sum((F.col("_n") < F.col("k")).cast("long"))
        .cast("long")
        .alias("classes_below"),
        F.sum(F.when(F.col("_n") < F.col("k"), F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_below"),
        F.min("_n").cast("long").alias("min_class_size"),
        F.min("_l").cast("long").alias("min_l_diversity"),
    )
    return agg.select(
        F.col("k").cast("long"),
        "n_classes",
        "n_rows",
        "classes_below",
        "rows_below",
        F.round(F.col("rows_below") * MICRO / F.col("n_rows"))
        .cast("long")
        .alias("risk_micro"),
        "min_class_size",
        "min_l_diversity",
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str | Column,
    epsilon_micro: int,
    seed: str = "release-1",
    sensitivity: int = 1,
) -> DataFrame:
    """ε-DP Laplace-noised per-group counts with a seeded, replayable
    noise draw (scale b = sensitivity/ε).

    The uniform u ∈ (0,1) is the exact dyadic rational
    (h + 0.5) / 2^48 with h = the first 48 bits of
    md5(seed ∥ ':' ∥ group) — strictly inside the interval, so the
    inverse CDF

        noise = −b · sign(u − ½) · ln(1 − 2·|u − ½|)

    is always finite.  1 − 2|u−½| is computed as the INTEGER
    m = 2^48 − |2h + 1 − 2^48| over 2^49 (a power-of-two division —
    exact in IEEE), so the only engine-sensitive step is one ln of an
    identical double, micro-rounded (the repo-wide ln discipline).

    Map-only after the counting groupBy — one shuffle total.

    Output: (group, true_n, noise_micro, noisy_micro, abs_err_micro).
    """
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    counts = (
        df.select(g.alias("g"))
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col("g"))), 1, 12),
        16,
        10,
    ).cast("long")
    two48 = F.lit(1 << _UBITS).cast("long")
    m = two48 - F.abs(h * 2 + 1 - two48)
    # ln(m / 2^48): power-of-two division is exact, ln DAG identical.
    ln_term = F.log(m.cast("double") / F.lit(float(1 << _UBITS)))
    # sign(u - 1/2): 2h + 1 vs 2^48 (integer comparison, never equal).
    sgn = F.when(h * 2 + 1 > two48, F.lit(1.0)).otherwise(F.lit(-1.0))
    b = F.lit(float(sensitivity)) * MICRO / F.lit(float(epsilon_micro))
    noise_micro = F.round(-sgn * b * ln_term * MICRO).cast("long")
    out = counts.select(
        F.col("g"),
        "true_n",
        noise_micro.alias("noise_micro"),
    )
    gname = group_col if isinstance(group_col, str) else "g"
    return out.select(
        F.col("g").alias(gname),
        "true_n",
        "noise_micro",
        (F.col("true_n") * MICRO + F.col("noise_micro"))
        .cast("long")
        .alias("noisy_micro"),
        F.abs("noise_micro").cast("long").alias("abs_err_micro"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_bucket,
    n_buckets: int,
    t_threshold_micro: int = 200_000,
) -> DataFrame:
    """t-closeness audit over quasi-identifier groups for an ORDERED
    bucketed sensitive attribute: per QI group the Earth-Mover
    Distance between the group's sensitive distribution and the
    GLOBAL one — the release gate that catches what k-anonymity
    (qa62) misses (a large group whose sensitive values all collapse
    into one bucket is k-anonymous but leaks).

    EMD over m ordered buckets = sum_i |cumP_i - cumQ_i| / (m-1).
    Exactness: the cumulative comparison is cross-multiplied into
    int64 (|cum_g*N - cum_all*n_g| — no per-bucket division), summed
    exactly, then ONE terminal micro-rounded division by
    n_g*N*(m-1).  Every group is completed to the full bucket spine
    (groups x m rows, groups are a dimension) so missing buckets
    count.  Flag compares the ROUNDED t to an integer threshold.

    Output per QI group: (*quasi_cols, n, t_micro, t_flag).
    """
    m = int(n_buckets)
    sb = (
        sensitive_bucket
        if not isinstance(sensitive_bucket, str)
        else F.col(sensitive_bucket)
    )
    qi = [F.col(c).alias(f"_q{i}") for i, c in enumerate(quasi_cols)]
    qnames = [f"_q{i}" for i in range(len(quasi_cols))]
    base = df.select(
        *qi,
        F.least(sb.cast("long"), F.lit(m - 1)).alias("_b"),
    )
    cells = base.groupBy(*qnames, "_b").agg(
        F.count("*").cast("long").alias("_c")
    )
    groups = cells.groupBy(*qnames).agg(
        F.sum("_c").cast("long").alias("_ng")
    )
    gbuckets = cells.groupBy("_b").agg(
        F.sum("_c").cast("long").alias("_cb")
    )
    spark = df.sparkSession
    spine = spark.range(m).select(F.col("id").cast("long").alias("_b"))
    gspine = groups.crossJoin(F.broadcast(spine))
    full = gspine.join(cells, qnames + ["_b"], "left").select(
        *qnames,
        "_ng",
        "_b",
        F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("_c"),
    )
    allsp = spine.join(F.broadcast(gbuckets), "_b", "left").select(
        "_b",
        F.coalesce(F.col("_cb"), F.lit(0)).cast("long").alias("_cb"),
    )
    n_all = df.count()
    wg = (
        Window.partitionBy(*qnames)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    cum_g = full.select(
        *qnames,
        "_ng",
        "_b",
        F.sum("_c").over(wg).alias("_cum_g"),
    )
    cum_a = allsp.select(
        "_b", F.sum("_cb").over(wa).alias("_cum_all")
    )
    joined = cum_g.join(F.broadcast(cum_a), "_b")
    emd = joined.groupBy(*qnames).agg(
        F.max("_ng").cast("long").alias("n"),
        F.sum(
            F.abs(
                F.col("_cum_g") * F.lit(int(n_all))
                - F.col("_cum_all") * F.col("_ng")
            )
        )
        .cast("long")
        .alias("_d"),
    )
    t = F.round(
        F.col("_d").cast("double")
        * F.lit(1_000_000.0)
        / (F.col("n") * F.lit(int(n_all)) * F.lit(m - 1)).cast("double")
    ).cast("long")
    out_cols = [
        F.col(f"_q{i}").alias(c) for i, c in enumerate(quasi_cols)
    ]
    return emd.select(
        *out_cols,
        "n",
        t.alias("t_micro"),
        (t > int(t_threshold_micro)).cast("long").alias("t_flag"),
    )


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    ln2_micro: int = 693_147,
    c_times: int = 2,
) -> DataFrame:
    """Entropy and recursive (c,l)-diversity per equivalence class —
    the two STRONGER variants from Machanavajjhala et al. 2007 that
    qa62's distinct-l misses: a class can hold many distinct sensitive
    values yet still leak if one value dominates.

    * entropy ℓ-diversity (ℓ=2): class entropy ≥ ln 2.  The entropy is
      the q66 integer idiom — Σ c·ln_micro(c) over sensitive-value
      counts c, entropy_micro = round((n·ln_micro(n) − Σ)/n) (ONE
      division), compared against the INJECTED ln2 constant (qa89
      rule) — an integer comparison, no engine-side transcendental at
      the decision point.
    * recursive (c,2)-diversity: the most frequent sensitive count
      must satisfy r1 < c·(n − r1) — pure int64.

    One shuffle to (class, sensitive) cells, one to class level.

    Output per class: qi_cols…, n, l_distinct, top_count,
    entropy_micro, entropy_l2_ok, recursive_c2_ok.
    """
    cells = (
        df.groupBy(*qi_cols, sensitive_col)
        .agg(F.count("*").cast("long").alias("_c"))
    )
    lnm = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")
    per = cells.groupBy(*qi_cols).agg(
        F.sum("_c").cast("long").alias("n"),
        F.count("*").cast("long").alias("l_distinct"),
        F.max("_c").cast("long").alias("top_count"),
        F.sum(F.col("_c") * lnm(F.col("_c"))).cast("long").alias("_slc"),
    )
    entropy = F.round(
        (F.col("n") * lnm(F.col("n")) - F.col("_slc")) / F.col("n")
    ).cast("long")
    return per.select(
        *qi_cols,
        "n",
        "l_distinct",
        "top_count",
        entropy.alias("entropy_micro"),
        (entropy >= F.lit(int(ln2_micro))).alias("entropy_l2_ok"),
        (
            F.col("top_count")
            < F.lit(int(c_times)) * (F.col("n") - F.col("top_count"))
        ).alias("recursive_c2_ok"),
    )
