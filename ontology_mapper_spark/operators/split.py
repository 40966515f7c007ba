"""Deterministic train/validation/test splitting for training-data
pipelines (group-aware: the split key decides, so all rows of one
conversation/document land in the same split — no leakage).

The split label is a pure function of md5(salt|key): the first 8 hex chars
are a uniform draw over [0, 2^32); cumulative fractions become HEX STRING
thresholds (lowercase hex compares monotonically with the value), so the
whole operator is one md5 + string comparisons — no RNG state, stable
under any partitioning/engine, trivially reproducible in SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_thresholds(fracs: dict[str, float]) -> list[tuple[str, str]]:
    """[(label, upper-bound hex8)] for all but the last label (which takes
    the remainder). Fractions must sum to ~1."""
    total = sum(fracs.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1")
    out = []
    acc = 0.0
    labels = list(fracs)
    for name in labels[:-1]:
        acc += fracs[name]
        # clamp: a cumulative fraction that rounds to 2**32 would format as
        # the 9-char '100000000', and lexicographic comparison vs the 8-char
        # md5 prefix would misroute ~15/16 of rows (ADVICE r2).
        bound = min(round(acc * 2**32), 2**32 - 1)
        out.append((name, format(bound, "08x")))
    return out


def hash_split_col(key: Column, fracs: dict[str, float], salt: str = "") -> Column:
    """Split label Column from a key Column (see module docstring)."""
    h = F.md5(
        F.encode(F.concat(F.lit(salt + "|"), key.cast("string")), "utf-8")
    ).substr(1, 8)
    labels = list(fracs)
    expr = None
    for name, thr in split_thresholds(fracs):
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1]))


def train_test_split(
    df: DataFrame,
    key_col: str,
    fracs: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """df + a `split` column; group-aware and deterministic."""
    fracs = fracs or {"train": 0.8, "valid": 0.1, "test": 0.1}
    return df.withColumn(out_col, hash_split_col(F.col(key_col), fracs, salt))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    frac: float,
    salt: str = "",
) -> DataFrame:
    """EXACT per-stratum fraction sample, deterministic: within each
    stratum, rows are ordered by md5(salt|key) (a uniform shuffle fixed by
    the salt, never by physical row order) and the first
    ceil(frac × stratum_size) survive.

    Unlike df.sampleBy (Bernoulli — per-stratum counts vary run to run and
    with partitioning), this gives byte-stable quotas: the per-source
    sampling step of a corpus-mixing pipeline must be reproducible for
    training-data lineage. One shuffle on the stratum key; the window is
    per-stratum with a total order (hash, then key as tiebreak for
    identical keys)."""
    from pyspark.sql import Window

    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    h = F.md5(
        F.encode(
            F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")), "utf-8"
        )
    )
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(key_col))
    wc = Window.partitionBy(stratum_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wc))
        .where(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(frac)))
        .drop("_rn", "_n")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 50,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row draws an exponential key
    -ln(U)/w from an md5-uniform U in (0, 1] and the k smallest keys win
    — inclusion probability proportional to weight, reproducible in any
    engine from (id, salt) alone, one TakeOrdered pass (per-partition
    heaps, no global sort, no RNG state).

    U = (hash60 + 1) / 2^60 where hash60 is the first 15 hex digits of
    md5(salt || id) — never 0, so ln is total. Weights are clamped to
    >= 1 (the exponential-key trick needs w > 0).

    Output: (id_col, weight, key_nano, rank), rank 1..k by (key, id).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    keyed = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
        h.alias("_h"),
    ).select(
        id_col,
        "_w",
        F.expr("-ln((_h + 1) / pow(2, 60)) / greatest(_w, 1)").alias("_key"),
    )
    top = keyed.orderBy(F.col("_key").asc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_key").asc(), F.col(id_col).asc())
    return top.select(
        id_col,
        F.col("_w").alias("weight"),
        F.expr("CAST(round(_key * 1e9) AS BIGINT)").alias("key_nano"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    size_col: str,
    target_total: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled corpus mixing (the multilingual-LM recipe:
    sample source s proportionally to size_s^alpha, alpha=1/2, so small
    sources are up-weighted relative to their raw share). Deterministic
    end to end:

      w_s     = floor(sqrt(sum(size over source s)))   # isqrt — bigint
      quota_s = (target_total * w_s) div sum(w)        # integer division
      keep    = the quota_s md5(salt|key)-ranked rows of source s

    floor(sqrt(bigint)) is exact in IEEE for inputs < 2^52 and identical
    in every engine; from there everything is bigint, so quotas are
    byte-stable — unlike probability-proportional Bernoulli mixing,
    reruns and oracles reproduce the selected set exactly. Sources with
    fewer rows than their quota contribute everything they have (the
    rank filter caps naturally); redistribution is deliberately NOT done
    (lineage simplicity beats hitting target_total to the row).

    One agg keyed by source (map-side combined), one broadcast join of
    the |sources|-sized quota table, one per-source window rank.
    Output: the selected rows as (source, key, quota).
    """
    from pyspark.sql import Window

    per_src = (
        df.groupBy(F.col(source_col).alias("_src"))
        .agg(F.sum(F.col(size_col).cast("long")).alias("_tot"))
        .select(
            "_src",
            F.floor(F.sqrt(F.col("_tot"))).cast("long").alias("_w"),
        )
    )
    sw = per_src.agg(F.sum("_w").alias("_sw"))
    quotas = per_src.crossJoin(F.broadcast(sw)).select(
        "_src",
        F.expr(f"CAST(({int(target_total)} * _w) div _sw AS BIGINT)").alias("quota"),
    )
    h = F.md5(
        F.encode(
            F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")), "utf-8"
        )
    )
    w = Window.partitionBy(source_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .join(
            F.broadcast(quotas).withColumnRenamed("_src", source_col), source_col
        )
        .where(F.col("_rn") <= F.col("quota"))
        .select(
            F.col(source_col).alias("source"),
            F.col(key_col).alias("key"),
            F.col("quota"),
        )
    )


def curriculum_interleave(
    df: DataFrame,
    source_col: str = "source",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Source-balanced curriculum order: within each source, examples
    rank easy→hard by (score, id) total order; sources are then
    round-robin interleaved so every training window sees the full mix.

    The global position is CLOSED-FORM — rank_in_source·n_sources +
    source_idx — so no global sort ever happens: one window per source
    partition plus a broadcast of the (tiny) source index.  A trainer
    consumes ORDER BY global_pos; positions are unique and dense up to
    per-source size imbalance (tail positions of exhausted sources are
    simply absent — gaps, not collisions).
    """
    w_src = Window.orderBy(source_col)  # |sources|-sized global window
    src_idx = (
        df.select(source_col)
        .distinct()
        .select(
            source_col,
            (F.row_number().over(w_src) - 1).cast("long").alias("_src_idx"),
        )
    )
    n_src = src_idx.groupBy().agg(F.count("*").cast("long").alias("_n_src"))
    w = Window.partitionBy(source_col).orderBy(score_col, id_col)
    ranked = df.select(
        F.col(id_col),
        F.col(source_col),
        (F.row_number().over(w) - 1).cast("long").alias("rank_in_source"),
    )
    return (
        ranked.join(F.broadcast(src_idx), source_col)
        .crossJoin(F.broadcast(n_src))
        .select(
            id_col,
            source_col,
            "rank_in_source",
            (F.col("rank_in_source") * F.col("_n_src") + F.col("_src_idx"))
            .alias("global_pos"),
        )
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a total
    budget of n draws, allocate n_h ∝ N_h·S_h (stratum size × stratum
    std-dev) — the variance-minimizing design for estimating a mean
    over heterogeneous sources, and the principled upgrade to q65's
    equal/proportional stratified sampling.

    Per stratum the sample variance comes from exact bigint sums
    (N, Σv, Σv²); sqrt is IEEE-correctly-rounded (bit-identical in any
    engine, unlike ln/exp), so the weight N_h·S_h is a fixed double
    DAG micro-rounded per stratum, integer-summed across strata via a
    window (never an order-dependent double sum), and each allocation
    is one terminal division.  Single-stratum-row table → all windows
    free.

    Output per stratum: n_rows, var_micro (sample variance, 0 when
    N_h < 2), weight_micro, alloc_n (rounded; ±1-off-total from
    independent rounding is documented — largest-remainder correction
    belongs to the caller if exact totals matter).
    """
    per = (
        df.select(
            F.col(stratum_col).alias("_h"),
            F.col(value_col).cast("long").alias("_v"),
        )
        .groupBy("_h")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("_v").cast("long").alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).cast("long").alias("_q"),
        )
    )
    var = F.when(
        F.col("n_rows") > 1,
        (
            F.col("_q").cast("double")
            - F.col("_s").cast("double") * F.col("_s") / F.col("n_rows")
        )
        / (F.col("n_rows") - 1),
    ).otherwise(F.lit(0.0))
    staged = per.select(
        "_h",
        "n_rows",
        F.round(var * 1_000_000).cast("long").alias("var_micro"),
        F.round(F.col("n_rows") * F.sqrt(var) * 1_000_000)
        .cast("long")
        .alias("weight_micro"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return staged.select(
        F.col("_h").alias(stratum_col),
        "n_rows",
        "var_micro",
        "weight_micro",
        F.when(
            F.sum("weight_micro").over(wall) > 0,
            F.round(
                F.lit(int(budget))
                * F.col("weight_micro").cast("double")
                / F.sum("weight_micro").over(wall)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("alloc_n"),
    )


def group_fold_audit(
    df: DataFrame,
    group_col: str,
    strat_col: str,
    k: int = 5,
    salt: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment audit — the cross-validation
    counterpart of train_test_split's leakage guarantee: the fold is a
    pure function of md5(salt|group), so every row of one group lands
    in ONE fold by construction, and this op PROVES it per fold while
    reporting balance.

    Checks per fold: row share vs the ideal 1/k, group count, and the
    worst per-stratum composition drift (max |fold share − global
    share| over ``strat_col`` values — a fold whose label mix diverges
    silently biases CV estimates).  `n_split_groups` is the leakage
    witness: groups observed in >1 fold (0 by construction; the column
    exists so a pipeline asserting on the output catches a broken
    upstream rewrite of the fold rule).

    One scan + two bounded aggs (folds × strata is a small grid);
    fold id = first 8 md5 hex chars mod k (the qa19 md5→int idiom).

    Output per fold: fold, n_rows, n_groups, row_share_micro,
    max_strat_dev_milli, n_split_groups.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.lit(salt), F.col(group_col).cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(strat_col).alias("_s"),
        F.pmod(h, F.lit(int(k))).alias("fold"),
    )
    # leakage witness: distinct folds per group (1 by construction)
    split_groups = (
        base.groupBy("_g")
        .agg(F.countDistinct("fold").alias("_nf"))
        .agg(
            F.sum(F.when(F.col("_nf") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_split_groups")
        )
    )
    cells = base.groupBy("fold", "_s").agg(
        F.count("*").cast("long").alias("_c")
    )
    fold_tot = cells.groupBy("fold").agg(
        F.sum("_c").cast("long").alias("n_rows")
    )
    strat_tot = cells.groupBy("_s").agg(
        F.sum("_c").cast("long").alias("_sc")
    )
    grand = fold_tot.agg(F.sum("n_rows").cast("long").alias("_n"))
    dev = (
        cells.join(F.broadcast(fold_tot), "fold")
        .join(F.broadcast(strat_tot), "_s")
        .crossJoin(F.broadcast(grand))
        .select(
            "fold",
            F.abs(
                F.round(F.col("_c") * 1000 / F.col("n_rows"))
                - F.round(F.col("_sc") * 1000 / F.col("_n"))
            )
            .cast("long")
            .alias("_d"),
        )
        .groupBy("fold")
        .agg(F.max("_d").alias("max_strat_dev_milli"))
    )
    groups = base.groupBy("fold").agg(
        F.countDistinct("_g").cast("long").alias("n_groups")
    )
    return (
        fold_tot.join(groups, "fold")
        .join(dev, "fold")
        .crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(split_groups))
        .select(
            F.col("fold").cast("long").alias("fold"),
            "n_rows",
            "n_groups",
            F.round(F.col("n_rows") * 1_000_000 / F.col("_n"))
            .cast("long")
            .alias("row_share_micro"),
            "max_strat_dev_milli",
            "n_split_groups",
        )
    )
