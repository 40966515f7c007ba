"""Salted-key skew handling (north_rule) as reusable operators.

Where skew shows up in this engine at 10^12-turn scale:

* a hot ontology class ("Disease") matches a large share of mentions →
  `groupBy(class)` aggregations get one giant reduce key;
* a mega-conversation (bot loops) makes one conv_id partition dominate
  the co-mention self-join;
* the canonicalization groupBy(node) sees the giant xref component's hub.

Spark-side mitigations used, in preference order:
1. algebraic aggregates (count/min/sum/approx_count_distinct) already get
   map-side partial aggregation — hot keys collapse BEFORE the shuffle;
   that is the built-in form of salting and needs no code;
2. AQE skew-join splitting (enabled in session.py) for joins;
3. the operators below for the residual cases: non-algebraic aggregates
   (collect_list/exact distinct counts) and joins AQE can't fix
   (e.g. inside iterative loops where stats are stale).

Both operators are pure DataFrame code and deterministic: the salt is
`pmod(xxhash64(row-identity), K)`, never a random number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_exact_distinct_count(
    df: DataFrame, group_col: str, distinct_col: str, salt: int = 16
) -> DataFrame:
    """Exact count(DISTINCT distinct_col) per group under heavy key skew.

    Two-phase: (group, salt-of-value) partial distinct → (group) final sum.
    The hot group's distinct set is partitioned across `salt` reducers
    instead of landing on one. Deterministic: salt = pmod(xxhash64(value)).
    (A plain groupBy().agg(countDistinct()) plans a single reducer per
    group for the distinct phase — the classic straggler at 10^12 rows.)
    """
    salted = df.select(
        F.col(group_col),
        F.col(distinct_col),
        F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt)).alias("_salt"),
    )
    partial = (
        salted.groupBy(group_col, "_salt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("_partial"))
    )
    return partial.groupBy(group_col).agg(
        F.sum("_partial").alias(f"n_distinct_{distinct_col}")
    )


def salted_join_big_to_skewed_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    big_row_id: Column | None = None,
) -> DataFrame:
    """Equi-join where `small` is too big to broadcast and `big` has hot
    keys: salt the big side by a deterministic row hash, replicate the
    small side `salt`×, join on (key, salt). Each hot key's rows spread
    over `salt` reducers.

    Use only when AQE skew-join can't apply (iterative loops, stale
    stats); otherwise prefer plain join + AQE.
    """
    rid = big_row_id if big_row_id is not None else F.xxhash64(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("_salt", F.pmod(rid, F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def hot_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Diagnostic: keys holding more than `min_share` of all rows —
    feed to monitoring or to choose salt factors (FIXTURES.md skew knob)."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= total * min_share)
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.col("n").desc())
    )


#: estimated in-memory width per non-string Spark type (bytes)
_FIXED_WIDTHS = {
    "integer": 4,
    "long": 8,
    "double": 8,
    "float": 4,
    "timestamp": 8,
    "timestamp_ntz": 8,
    "date": 4,
    "boolean": 1,
    "short": 2,
    "byte": 1,
}


def join_side_stats(
    df: DataFrame, table_name: str, key_col: str
) -> DataFrame:
    """One-row join-side profile: row count, estimated payload bytes
    (Σ octet_length over string columns + fixed widths for the rest —
    the broadcast-feasibility number), and the hottest join-key share.

    Two aggregates (bytes/rows; per-key max) cross-joined — both
    single-row, so the profile costs one pass over the table however
    large it is.
    """
    fixed = 0
    str_cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t == "string":
            str_cols.append(f.name)
        else:
            fixed += _FIXED_WIDTHS.get(t, 8)
    byte_expr = F.lit(0).cast("long")
    for c in str_cols:
        byte_expr = byte_expr + F.coalesce(F.octet_length(F.col(c)), F.lit(0))
    base = df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(byte_expr).cast("long").alias("_str_bytes"),
    ).select(
        "n_rows",
        (F.col("_str_bytes") + F.col("n_rows") * F.lit(fixed))
        .cast("long")
        .alias("est_bytes"),
    )
    hot = (
        df.groupBy(F.col(key_col).alias("_k"))
        .agg(F.count("*").alias("_c"))
        .agg(F.max("_c").cast("long").alias("max_key_rows"))
    )
    return base.crossJoin(hot).select(
        F.lit(table_name).alias("table_name"),
        "n_rows",
        "est_bytes",
        "max_key_rows",
        F.round(F.col("max_key_rows") * F.lit(1_000_000) / F.col("n_rows"))
        .cast("long")
        .alias("hot_share_micro"),
    )


def join_strategy_advisor(
    profiles: "list[DataFrame]",
    broadcast_bytes: int = 10 * 1024 * 1024,
    hot_share_micro: int = 50_000,
) -> DataFrame:
    """Classify each profiled join side into the physical strategy a
    100 TB plan should use: ``broadcast`` (fits the 10 MB default
    autoBroadcast budget), ``salted-shuffle`` (too big to broadcast AND
    one key holds ≥5% of rows — AQE's skew split won't help inside
    iterative loops with stale stats; route via operators/skewjoin.py),
    else plain ``shuffle``.  Pure decision logic over the one-row
    profiles — the audit table a pipeline materializes next to its
    metrics so regressions in dimension-table size show up as plan
    changes BEFORE they show up as shuffle spill.
    """
    u = profiles[0]
    for p in profiles[1:]:
        u = u.unionByName(p)
    return u.select(
        "table_name",
        "n_rows",
        "est_bytes",
        "max_key_rows",
        "hot_share_micro",
        F.when(F.col("est_bytes") <= broadcast_bytes, F.lit("broadcast"))
        .when(
            F.col("hot_share_micro") >= hot_share_micro,
            F.lit("salted-shuffle"),
        )
        .otherwise(F.lit("shuffle"))
        .alias("strategy"),
    )


def shuffle_balance_audit(
    df: DataFrame,
    key_col: str,
    n_partitions: int = 64,
) -> DataFrame:
    """Simulate how a shuffle on ``key_col`` loads ``n_partitions``
    reducers — the sizing audit behind `spark.sql.shuffle.partitions`
    and the numeric justification for salting: a balanced shuffle shows
    balance_micro ≈ 1e6 everywhere; a hot key shows one partition at
    N×1e6.

    Partition assignment is md5-based (NOT the engine's own hash) so
    the simulation is portable and oracle-replayable; the CONCLUSION
    (max/mean load ratio under any uniform hash) transfers because hot
    keys collide with themselves under every hash function.  One
    groupBy(key) (map-side combined) + one tiny partition-level agg.

    Output per simulated partition: partition_id, n_rows, n_keys,
    load_share_micro, balance_micro (load vs perfectly-even).
    """
    from pyspark.sql import Window

    per_key = (
        df.select(F.col(key_col).alias("_k"))
        .groupBy("_k")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    per_part = (
        per_key.select(
            (
                F.conv(
                    F.substring(F.md5(F.col("_k").cast("string")), 1, 12),
                    16,
                    10,
                ).cast("long")
                % n_partitions
            ).alias("partition_id"),
            "_c",
        )
        .groupBy("partition_id")
        .agg(
            F.sum("_c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_part.select(
        F.col("partition_id").cast("long"),
        "n_rows",
        "n_keys",
        F.round(F.col("n_rows") * F.lit(1_000_000) / F.sum("n_rows").over(wall))
        .cast("long")
        .alias("load_share_micro"),
        F.round(
            F.col("n_rows")
            * F.lit(int(n_partitions))
            * F.lit(1_000_000)
            / F.sum("n_rows").over(wall)
        )
        .cast("long")
        .alias("balance_micro"),
    )


def shuffle_partition_advisor(
    df: DataFrame,
    key_col: str,
    target_mb: int = 128,
) -> DataFrame:
    """`spark.sql.shuffle.partitions` sizing advisor for a groupBy/join
    on ``key_col``: estimated shuffled payload bytes (the
    join_side_stats width model: Σ octet_length over strings + fixed
    type widths) divided by the target partition size, bounded by what
    the KEY DISTRIBUTION can actually use — parallelism never exceeds
    the distinct-key count, and the hottest single key is an
    unsplittable straggler floor unless the caller salts (the
    skewjoin.py discipline).

    All integer: partitions_by_bytes is an exact ceiling division;
    straggler_ratio_milli = hottest key's bytes vs the target (>1000 ⇒
    salting mandatory — one reducer would exceed the target no matter
    how many partitions are configured).

    Output (single row): n_rows, n_keys, est_bytes, target_bytes,
    partitions_by_bytes, recommended_partitions, max_key_bytes,
    straggler_ratio_milli.
    """
    fixed = 0
    str_cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t == "string":
            str_cols.append(f.name)
        else:
            fixed += _FIXED_WIDTHS.get(t, 8)
    byte_expr = F.lit(0).cast("long") + F.lit(fixed)
    for c in str_cols:
        byte_expr = byte_expr + F.coalesce(F.octet_length(F.col(c)), F.lit(0))
    target = int(target_mb) * 1024 * 1024
    per_key = (
        df.select(F.col(key_col).alias("_k"), byte_expr.alias("_b"))
        .groupBy("_k")
        .agg(
            F.count("*").cast("long").alias("_c"),
            F.sum("_b").cast("long").alias("_kb"),
        )
    )
    agg = per_key.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum("_kb").cast("long").alias("est_bytes"),
        F.max("_kb").cast("long").alias("max_key_bytes"),
    )
    parts = F.expr(f"(est_bytes + {target} - 1) div {target}")
    return agg.select(
        "n_rows",
        "n_keys",
        "est_bytes",
        F.lit(target).cast("long").alias("target_bytes"),
        parts.cast("long").alias("partitions_by_bytes"),
        F.greatest(F.least(parts, F.col("n_keys")), F.lit(1))
        .cast("long")
        .alias("recommended_partitions"),
        "max_key_bytes",
        F.round(F.col("max_key_bytes").cast("double") * 1000 / F.lit(target))
        .cast("long")
        .alias("straggler_ratio_milli"),
    )


def hash_bucket_skew_sim(
    df: DataFrame,
    key_col: str,
    partitions_grid: tuple[int, ...] = (8, 32, 128, 512),
    skew_factor: int = 5,
) -> DataFrame:
    """Hash-partitioning simulation over a grid of partition counts —
    what AQE's skew detector would SEE if this key shuffled into P
    buckets: max bucket size vs the ideal n/P, and how many buckets
    exceed ``skew_factor``× the ideal (the split candidates).

    Differs from the per-KEY advisors (qd09/qa74): this models the
    actual bucket assignment, so it captures hot-key PILE-UP — two big
    keys colliding in one bucket — which no per-key view shows.  The
    bucket function is the deterministic md5 %% P (portable to the
    oracle; Spark's real partitioner differs in constants but not in
    collision statistics).  Everything integer: the over-threshold
    test is c·P > skew_factor·n exactly.

    Output per grid entry: partitions, max_bucket_rows,
    skew_ratio_milli, n_buckets_over.
    """
    keyed = (
        df.select(F.col(key_col).alias("_k"))
        .groupBy("_k")
        .agg(F.count("*").cast("long").alias("_c"))
        .withColumn(
            "_h",
            F.conv(
                F.substring(F.md5(F.col("_k").cast("string")), 1, 8), 16, 10
            ).cast("long"),
        )
    )
    grid = df.sparkSession.createDataFrame(
        [(int(p),) for p in partitions_grid], "partitions long"
    )
    buckets = (
        keyed.crossJoin(F.broadcast(grid))
        .select(
            "partitions",
            F.pmod(F.col("_h"), F.col("partitions")).alias("_b"),
            "_c",
        )
        .groupBy("partitions", "_b")
        .agg(F.sum("_c").cast("long").alias("_rows"))
    )
    tot = keyed.agg(F.sum("_c").cast("long").alias("_n"))
    return (
        buckets.crossJoin(F.broadcast(tot))
        .groupBy("partitions")
        .agg(
            F.max("_rows").cast("long").alias("max_bucket_rows"),
            F.first("_n").alias("_n"),
            F.sum(
                F.when(
                    F.col("_rows") * F.col("partitions")
                    > F.lit(int(skew_factor)) * F.col("_n"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_buckets_over"),
        )
        .select(
            "partitions",
            "max_bucket_rows",
            F.round(
                F.col("max_bucket_rows") * F.col("partitions") * 1000
                / F.col("_n")
            )
            .cast("long")
            .alias("skew_ratio_milli"),
            "n_buckets_over",
        )
    )
