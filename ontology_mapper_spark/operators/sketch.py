"""Distinct-count sketches (KMV, HyperLogLog) with reproducible hashing.

At 100 TB you don't count distinct keys exactly per group — you sketch.
Both sketches here are built from the same deterministic 60-bit hash
(`md5` of the value's string form, first 15 hex digits), so the register
state — not just the estimate — is bit-identical in any engine that has
md5, which is what makes them oracle-checkable (same discipline as the
md5-slice minhash family in `dedup.py`).

Scale notes:

* **KMV (k-minimum-values, Bar-Yossef et al. 2002)**: the k smallest
  hashes per group. One shuffle keyed by group; the per-group rank runs
  on hash-sorted rows after a distinct-first collapse so zipf-hot
  duplicate values cost one row each. Estimate = (k−1)·2^60 / kth_hash
  (single division, micro-free — the output is an integer count).
* **HLL (Flajolet et al. 2007)**: bucket = top `b` bits, rho = leading
  zeros of the remaining 60−b bits + 1; registers are `max(rho)` per
  (group, bucket) — a map-side-combinable aggregate, ONE shuffle of at
  most m=2^b rows per group regardless of input size. The harmonic sum
  is computed as an exact integer scaled by 2^(62−b) (`Σ 2^(62−b−rho)`;
  empty registers contribute 2^(62−b), so the total is ≤ m·2^(62−b) =
  2^62 and can never overflow bigint), leaving the final
  alpha·m²·2^(62−b) / S division as the only floating step. Raw HLL estimate, no small-range
  correction — documented, deterministic semantics; `n_zero_buckets`
  is emitted so a consumer can apply linear counting if wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash60(value: F.Column) -> F.Column:
    """First 60 bits of md5(value-as-string) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Groups with fewer than k distinct values fall back to the exact
    count (the kth minimum doesn't exist — standard KMV behavior).
    Output: (*group_cols, n_exact, kmv_est) — both bigint.
    """
    d = df.select(*group_cols, F.col(value_col).alias("_v")).distinct()
    h = d.select(*group_cols, _hash60(F.col("_v")).alias("_h"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    ranked = h.select(
        *group_cols,
        "_h",
        F.row_number().over(w).alias("_r"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count("*").alias("_n"),
        F.max(F.when(F.col("_r") == k, F.col("_h"))).alias("_kth"),
    )
    est = (
        F.when(F.col("_kth").isNull(), F.col("_n"))
        .otherwise(
            F.round((k - 1) * F.lit(float(2**60)) / F.col("_kth"))
        )
        .cast("long")
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("long").alias("n_exact"),
        est.alias("kmv_est"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 6,
) -> DataFrame:
    """Per-group raw-HLL distinct-count estimate next to the exact count.

    m = 2**b registers; alpha_m = 0.7213/(1 + 1.079/m) (the standard
    constant for m >= 128 applied uniformly — part of the defined,
    reproducible semantics). Output:
    (*group_cols, n_exact, hll_est, n_zero_buckets) — all bigint.
    """
    m = 2**b
    rest_bits = 60 - b
    alpha = 0.7213 / (1 + 1.079 / m)
    h = df.select(*group_cols, _hash60(F.col(value_col)).alias("_h"))
    parts = h.select(
        *group_cols,
        "_h",
        F.expr(f"_h div {2 ** rest_bits}").alias("_bucket"),
        F.expr(f"_h % {2 ** rest_bits}").alias("_rest"),
    )
    rho = (
        F.when(F.col("_rest") == 0, F.lit(rest_bits + 1))
        .otherwise(rest_bits - F.length(F.bin(F.col("_rest"))) + 1)
        .alias("_rho")
    )
    regs = (
        parts.select(*group_cols, "_bucket", rho)
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_M"))
    )
    # exact distinct per group rides the same scan (for the comparison col)
    exact = (
        df.select(*group_cols, F.col(value_col).alias("_v"))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_exact"))
    )
    shift = 62 - b
    sums = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"CAST(pow(2, {shift} - _M) AS BIGINT)")).alias("_s_used"),
        F.count("*").alias("_n_used"),
    )
    s_total = F.col("_s_used") + (m - F.col("_n_used")) * F.lit(2**shift)
    est = F.round(F.lit(alpha * m * m * float(2**shift)) / s_total).cast("long")
    return (
        exact.join(sums, group_cols)
        .select(
            *group_cols,
            F.col("n_exact").cast("long"),
            est.alias("hll_est"),
            (m - F.col("_n_used")).cast("long").alias("n_zero_buckets"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_cell(item: F.Column, row: F.Column, width: int) -> F.Column:
    """Cell index for (hash-row, item): 60-bit md5 of 'r|item' mod width.
    Verbatim in SQL: ('0x'||substr(md5(r||'|'||item),1,15))::BIGINT % w."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit("|"), item.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_sketch(
    items: DataFrame,
    item_col: str,
    weight_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(r, cell, cnt) count-min sketch rows from WEIGHTED DISTINCT items.

    Distinct-first discipline: the caller pre-aggregates the raw stream
    to (item, count) — one map-side-combined shuffle — so the d md5
    evaluations happen once per distinct item, not once per occurrence
    (zipf-hot tokens cost one row). The sketch itself is d×w rows: a
    mergeable partial aggregate (cells sum), broadcastable anywhere,
    which is the whole point at 100 TB — heavy-hitter counts in O(d·w)
    memory per executor with one shuffle of at most d·w rows.
    """
    rows = items.select(
        F.col(item_col).alias("_it"),
        F.col(weight_col).alias("_w"),
    ).select(
        "_it",
        "_w",
        F.explode(F.array(*[F.lit(r).cast("int") for r in range(depth)])).alias("r"),
    )
    return (
        rows.select("r", cms_cell(F.col("_it"), F.col("r"), width).alias("cell"), "_w")
        .groupBy("r", "cell")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_estimates(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates: est(item) = min over rows of its cell count.
    The sketch side is broadcast (≤ d·w rows); estimation is map-only
    plus one per-item min — never a shuffle of the sketch."""
    rows = items.select(
        F.col(item_col),
        F.explode(F.array(*[F.lit(r).cast("int") for r in range(depth)])).alias("r"),
    ).withColumn("cell", cms_cell(F.col(item_col), F.col("r"), width))
    return (
        rows.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise union / Jaccard / intersection ESTIMATES between every
    pair of groups from k-minimum-values sketches (Beyer et al. 2007)
    — the sketch algebra that answers "how much vocabulary do these
    two sources share?" without ever joining the full value sets: at
    100 TB the per-group sketch is k rows, so all pair math runs on a
    (n_groups·k)-row table.

    The union sketch of a pair is the k smallest DISTINCT hashes of
    the two sketches' union (valid because min-k of a union = min-k of
    the min-k's); |A∪B| estimates as (k−1)·2^60/kth (exact k' when the
    union sketch is short — then it contains every value).  Jaccard
    is the matched fraction of the union sketch (a hash is "matched"
    when it sits in BOTH per-group sketches); the intersection
    estimate re-scales the union estimate by it.  All arithmetic is
    integer until each estimate's one terminal division; the 60-bit
    md5 hash makes every sketch — and so every estimate —
    bit-identical across engines.

    Output per unordered group pair (group_a < group_b): n_sketch
    (union-sketch size k'), n_matched, union_est, jaccard_micro,
    inter_est.
    """
    d = df.select(
        F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    ).distinct()
    h = d.select("_g", _hash60(F.col("_v")).alias("_h"))
    w = Window.partitionBy("_g").orderBy(F.col("_h").asc())
    sk = (
        h.select("_g", "_h", F.row_number().over(w).alias("_r"))
        .where(F.col("_r") <= k)
        .select("_g", "_h")
    )
    pairs = (
        sk.select(F.col("_g").alias("_ga"))
        .distinct()
        .crossJoin(sk.select(F.col("_g").alias("_gb")).distinct())
        .where(F.col("_ga") < F.col("_gb"))
    )
    cand = (
        pairs.join(
            sk.select(F.col("_g").alias("_ga"), "_h", F.lit(1).alias("_ina")),
            "_ga",
        )
        .select("_ga", "_gb", "_h", "_ina", F.lit(0).alias("_inb"))
        .unionByName(
            pairs.join(
                sk.select(
                    F.col("_g").alias("_gb"), "_h", F.lit(1).alias("_inb")
                ),
                "_gb",
            ).select("_ga", "_gb", "_h", F.lit(0).alias("_ina"), "_inb")
        )
    )
    merged = cand.groupBy("_ga", "_gb", "_h").agg(
        F.max("_ina").alias("_ina"), F.max("_inb").alias("_inb")
    )
    wu = Window.partitionBy("_ga", "_gb").orderBy(F.col("_h").asc())
    union_sk = merged.withColumn("_r", F.row_number().over(wu)).where(
        F.col("_r") <= k
    )
    agg = union_sk.groupBy("_ga", "_gb").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max(F.when(F.col("_r") == k, F.col("_h"))).alias("_kth"),
        F.sum((F.col("_ina") * F.col("_inb")).cast("long"))
        .cast("long")
        .alias("n_matched"),
    )
    union_est = (
        F.when(F.col("_kth").isNull(), F.col("n_sketch"))
        .otherwise(F.round((k - 1) * F.lit(float(2**60)) / F.col("_kth")))
        .cast("long")
    )
    staged = agg.select(
        F.col("_ga").alias("group_a"),
        F.col("_gb").alias("group_b"),
        "n_sketch",
        "n_matched",
        union_est.alias("union_est"),
    )
    return staged.select(
        "group_a",
        "group_b",
        "n_sketch",
        "n_matched",
        "union_est",
        F.round(F.col("n_matched") * F.lit(1_000_000) / F.col("n_sketch"))
        .cast("long")
        .alias("jaccard_micro"),
        F.round(
            F.col("n_matched") * F.col("union_est") / F.col("n_sketch")
        )
        .cast("long")
        .alias("inter_est"),
    )


def capture_recapture(
    df: DataFrame,
    value_col: str,
    in_a_col,
    in_b_col,
) -> DataFrame:
    """Chapman capture-recapture estimate of the TRUE distinct
    population from two overlapping samples (Chapman 1951):
    N̂ = (n_a+1)(n_b+1)/(m+1) − 1 with m = values seen in both — the
    corpus-cardinality planner when scanning everything is off the
    table and the two "captures" are cheap (two crawl days, two
    shards, two hash-split probes).  Complements the KMV/HLL sketches:
    those need a full pass; this needs only two samples.

    Distinct membership per value is ONE groupBy with two max flags;
    the estimate is a single rounded division of int64 products.

    Output (single row): n_a, n_b, n_both, chapman_est (bigint),
    jaccard_micro of the two samples (NULL when their union is
    empty).
    """
    a = (in_a_col if not isinstance(in_a_col, str) else F.col(in_a_col)).cast(
        "boolean"
    )
    b = (in_b_col if not isinstance(in_b_col, str) else F.col(in_b_col)).cast(
        "boolean"
    )
    per = (
        df.select(F.col(value_col).alias("_v"), a.alias("_a"), b.alias("_b"))
        .groupBy("_v")
        .agg(
            F.max(F.col("_a").cast("long")).alias("_ina"),
            F.max(F.col("_b").cast("long")).alias("_inb"),
        )
        .where((F.col("_ina") + F.col("_inb")) > 0)
    )
    agg = per.agg(
        F.sum("_ina").cast("long").alias("n_a"),
        F.sum("_inb").cast("long").alias("n_b"),
        F.sum(F.col("_ina") * F.col("_inb")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("_n_union"),
    )
    est = F.round(
        (F.col("n_a") + 1).cast("double")
        * (F.col("n_b") + 1)
        / (F.col("n_both") + 1)
    ).cast("long") - 1
    return agg.select(
        "n_a",
        "n_b",
        "n_both",
        est.alias("chapman_est"),
        F.when(
            F.col("_n_union") > 0,
            F.round(
                F.col("n_both") * F.lit(1_000_000) / F.col("_n_union")
            ).cast("long"),
        ).alias("jaccard_micro"),
    )


def hll_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    b: int = 6,
) -> DataFrame:
    """Rolling W-day distinct-count estimate from MERGED daily HLL
    sketches — the mergeability demo that matters at 100 TB: daily
    registers are built ONCE (one groupBy over the raw scan), and every
    W-day window is a register-wise max over at most W tiny register
    sets, so the rolling series costs W small rows per day instead of
    re-scanning W days of raw data per window.

    Window ends are the OBSERVED days only (each day d covers days
    d-W+1..d); the exact rolling distinct rides along as the audit
    column (distinct (day, value) pairs exploded to their covering
    windows — the expensive path the sketch replaces at scale).

    Output: (window_end 'yyyy-MM-dd', n_days, n_exact, hll_est).
    """
    m = 2**b
    rest_bits = 60 - b
    shift = 62 - b
    alpha_num = 0.7213 / (1 + 1.079 / m) * m * m * float(2**shift)
    day_us = 86_400_000_000
    base = df.select(
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {day_us}"
        ).alias("_day"),
        _hash60(F.col(value_col)).alias("_h"),
        F.col(value_col).alias("_v"),
    )
    rho = (
        F.when(F.col("_rest") == 0, F.lit(rest_bits + 1))
        .otherwise(rest_bits - F.length(F.bin(F.col("_rest"))) + 1)
        .alias("_rho")
    )
    day_regs = (
        base.select(
            "_day",
            F.expr(f"_h div {2 ** rest_bits}").alias("_bucket"),
            F.expr(f"_h % {2 ** rest_bits}").alias("_rest"),
        )
        .select("_day", "_bucket", rho)
        .groupBy("_day", "_bucket")
        .agg(F.max("_rho").alias("_M"))
    )
    observed = base.select("_day").distinct()
    span = F.explode(
        F.sequence(F.col("_day"), F.col("_day") + (window_days - 1))
    ).alias("_wend")
    win_regs = (
        day_regs.select("_bucket", "_M", span)
        .join(
            F.broadcast(observed.withColumnRenamed("_day", "_wend")),
            "_wend",
            "left_semi",
        )
        .groupBy("_wend", "_bucket")
        .agg(F.max("_M").alias("_M"))
    )
    sums = win_regs.groupBy("_wend").agg(
        F.sum(F.expr(f"CAST(pow(2, {shift} - _M) AS BIGINT)")).alias(
            "_s_used"
        ),
        F.count("*").alias("_n_used"),
    )
    est = F.round(
        F.lit(alpha_num)
        / (F.col("_s_used") + (m - F.col("_n_used")) * F.lit(2**shift))
    ).cast("long")
    n_days = (
        observed.select(F.col("_day").alias("_d"), span)
        .join(
            F.broadcast(observed.withColumnRenamed("_day", "_wend")),
            "_wend",
            "left_semi",
        )
        .groupBy("_wend")
        .agg(F.count("*").cast("long").alias("n_days"))
    )
    exact = (
        base.select("_day", "_v")
        .distinct()
        .select("_v", span)
        .join(
            F.broadcast(observed.withColumnRenamed("_day", "_wend")),
            "_wend",
            "left_semi",
        )
        .groupBy("_wend")
        .agg(F.countDistinct("_v").cast("long").alias("n_exact"))
    )
    return (
        n_days.join(exact, "_wend")
        .join(sums, "_wend")
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01"), F.col("_wend").cast("int")),
                "yyyy-MM-dd",
            ).alias("window_end"),
            "n_days",
            "n_exact",
            est.alias("hll_est"),
        )
    )


def binned_quantile_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[int, ...] = (50, 90, 99),
    bin_width: int = 128,
) -> DataFrame:
    """Mergeable binned-histogram quantile sketch vs the exact type-1
    quantile, per group — the bounded-error scale path for percentile
    ladders: per-partition fixed-width histograms merge by SUM (one
    hash aggregate over the raw scan), so a p99 series over 100 TB
    never sorts raw rows; the exact value (from the per-group
    distinct-VALUE histogram's cumulative counts, the qb18/qb43 idiom)
    rides along as the audit column.

    Values must be non-negative int64 (bin = v div w needs monotone
    truncating division); quantiles are integer percents and the target
    rank is exact: ceil(q·n/100) = (q·n + 99) div 100.  The sketch
    reports the UPPER edge of the first bin whose cumulative count
    reaches the rank, so sketch ≥ exact and the error is < bin_width by
    construction (property-tested).

    Output: (group, q_pct, n, exact_value, sketch_value, err).
    """
    w = int(bin_width)
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    n = base.groupBy("_g").agg(F.count("*").cast("long").alias("n"))
    qarr = F.array(*[F.lit(int(q)) for q in quantiles])
    ranks = n.select(
        "_g",
        "n",
        F.explode(qarr).alias("q_pct"),
    ).withColumn("_rank", F.expr("(q_pct * n + 99) div 100"))

    hist = base.groupBy("_g", "_v").agg(F.count("*").alias("_c"))
    wv = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumv = hist.select("_g", "_v", F.sum("_c").over(wv).alias("_cum"))
    exact = (
        cumv.join(F.broadcast(ranks), "_g")
        .where(F.col("_cum") >= F.col("_rank"))
        .groupBy("_g", "q_pct", "n")
        .agg(F.min("_v").alias("exact_value"))
    )

    bhist = (
        base.select("_g", F.expr(f"_v div {w}").alias("_b"))
        .groupBy("_g", "_b")
        .agg(F.count("*").alias("_c"))
    )
    wb = (
        Window.partitionBy("_g")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumb = bhist.select("_g", "_b", F.sum("_c").over(wb).alias("_cum"))
    sketch = (
        cumb.join(F.broadcast(ranks.select("_g", "q_pct", "_rank")), "_g")
        .where(F.col("_cum") >= F.col("_rank"))
        .groupBy("_g", "q_pct")
        .agg(
            (F.min("_b") * w + (w - 1)).cast("long").alias("sketch_value")
        )
    )
    return (
        exact.join(sketch, ["_g", "q_pct"])
        .select(
            F.col("_g").alias(group_col),
            F.col("q_pct").cast("long").alias("q_pct"),
            "n",
            "exact_value",
            "sketch_value",
            (F.col("sketch_value") - F.col("exact_value"))
            .cast("long")
            .alias("err"),
        )
    )


def feature_hash_collisions(
    df: DataFrame,
    feature_col: str,
    log2_dims: tuple[int, ...] = (8, 12, 16),
) -> DataFrame:
    """Hashing-trick collision audit: for each candidate dimension
    2^k, how many DISTINCT features share a bucket with another
    feature — the number that picks the feature-hashing width before
    training (collisions alias gradients; the audit is one distinct +
    one double aggregate per k over the same md5 values, never a
    second corpus scan).

    Buckets are the low k bits of the 60-bit md5 integer (the
    established hash-split idiom, bit-identical in any engine).

    Output per k: (log2_dims, n_features, n_buckets_used,
    n_collided_features, collided_share_micro, max_bucket_load).
    """
    feats = (
        df.select(F.col(feature_col).alias("_f"))
        .distinct()
        .select("_f", _hash60(F.col("_f")).alias("_h"))
    )
    karr = F.explode(
        F.array(*[F.lit(int(k)) for k in log2_dims])
    ).alias("_k")
    buckets = feats.select("_h", karr).select(
        "_k", F.expr("_h % shiftleft(CAST(1 AS BIGINT), _k)").alias("_b")
    )
    per_bucket = buckets.groupBy("_k", "_b").agg(
        F.count("*").cast("long").alias("_load")
    )
    return per_bucket.groupBy("_k").agg(
        F.sum("_load").cast("long").alias("n_features"),
        F.count("*").cast("long").alias("n_buckets_used"),
        F.sum(F.when(F.col("_load") > 1, F.col("_load")).otherwise(0))
        .cast("long")
        .alias("n_collided_features"),
        F.round(
            F.sum(F.when(F.col("_load") > 1, F.col("_load")).otherwise(0))
            * F.lit(1_000_000)
            / F.sum("_load")
        )
        .cast("long")
        .alias("collided_share_micro"),
        F.max("_load").cast("long").alias("max_bucket_load"),
    ).select(
        F.col("_k").cast("long").alias("log2_dims"),
        "n_features",
        "n_buckets_used",
        "n_collided_features",
        "collided_share_micro",
        "max_bucket_load",
    )


def misra_gries_heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Exact heavy hitters via a two-pass Misra-Gries sketch — all
    values with frequency strictly above N/k, WITHOUT ever grouping
    the full vocabulary: pass 1 runs a k-counter MG summary per
    partition inside mapInPandas (vectorized per Arrow batch in its
    mergeable-summaries form — add the batch's value_counts, then
    subtract the (k+1)-th largest and drop ≤0; Agarwal/Cormode et al.
    2012 prove this keeps the ε=1/k undercount bound), pass 2
    broadcast-semi-joins the ≤ k·partitions candidates back and
    recounts them EXACTLY.

    Why the result is deterministic (and oracle-checkable) even though
    the sketch isn't: MG undercounts by at most N/k, so every value
    with true frequency > N/k survives SOME partition's summary
    (pigeonhole over partition thresholds) — candidates are a
    superset of the answer under ANY partitioning/arrival order, and
    the exact recount + strict threshold makes the final set and
    counts partition-invariant.  The classic 100 TB top-token plan:
    two scans, no vocabulary-sized shuffle.

    Output: (value, freq, share_micro) for every value with
    freq·k > N.
    """
    import pandas as pd

    toks = df.select(F.col(value_col).cast("string").alias("value"))
    kk = int(k)

    def mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = counters.add(
                pdf["value"].value_counts(), fill_value=0
            )
            if len(counters) > kk:
                m = counters.nlargest(kk + 1).iloc[-1]
                counters = counters - m
                counters = counters[counters > 0]
        yield pd.DataFrame({"value": counters.index.astype(str)})

    cands = toks.mapInPandas(mg, "value string").distinct()
    tot = toks.agg(F.count("*").cast("long").alias("_n_total"))
    counts = (
        toks.join(F.broadcast(cands), "value")
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .where(F.col("freq") * kk > F.col("_n_total"))
        .select(
            "value",
            "freq",
            F.round(F.col("freq") * F.lit(1_000_000) / F.col("_n_total"))
            .cast("long")
            .alias("share_micro"),
        )
    )


def bloom_planner_rows(
    grid: tuple[tuple[int, int], ...] = (
        (8, 4), (8, 6), (12, 8), (16, 8), (16, 11), (20, 14),
    ),
) -> list[tuple]:
    """Injected Bloom-filter design table: rows (bits_per_key, k,
    fpr_micro, is_opt) with fpr = (1 − e^(−k/b))^k computed ONCE in
    Python (qa89 constant-table rule — no engine evaluates exp/pow)
    and is_opt marking k = round(b·ln2), the analytic optimum."""
    import math

    rows = []
    for b, k in grid:
        fpr = (1 - math.exp(-k / b)) ** k
        rows.append(
            (int(b), int(k), round(fpr * 1_000_000),
             k == round(b * math.log(2)))
        )
    return rows


def bloom_planner(
    df: DataFrame,
    key_col: str,
    grid: tuple[tuple[int, int], ...] = (
        (8, 4), (8, 6), (12, 8), (16, 8), (16, 11), (20, 14),
    ),
) -> DataFrame:
    """Bloom-filter sizing planner — the design-side companion to
    qb64's MEASURED FPR audit: for the corpus's actual distinct-key
    count, what does each (bits-per-key, hash-count) config cost in
    memory and buy in false-positive rate?  FPR values come from the
    injected `bloom_planner_rows` table (pure constants — k/b is
    data-independent); the data contributes only the exact distinct
    count for the memory column.

    Output per config: bits_per_key, k_hashes, fpr_micro, is_opt,
    n_keys, bits_total, mb_milli.
    """
    n = df.agg(
        F.countDistinct(F.col(key_col)).cast("long").alias("n_keys")
    )
    g = df.sparkSession.createDataFrame(
        bloom_planner_rows(grid),
        ["bits_per_key", "k_hashes", "fpr_micro", "is_opt"],
    )
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            F.col("bits_per_key").cast("long").alias("bits_per_key"),
            F.col("k_hashes").cast("long").alias("k_hashes"),
            F.col("fpr_micro").cast("long").alias("fpr_micro"),
            "is_opt",
            "n_keys",
            (F.col("n_keys") * F.col("bits_per_key"))
            .cast("long")
            .alias("bits_total"),
            F.round(
                F.col("n_keys")
                * F.col("bits_per_key")
                * 1000
                / 8_000_000
            )
            .cast("long")
            .alias("mb_milli"),
        )
    )
