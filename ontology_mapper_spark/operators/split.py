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

from pyspark.sql import Column, DataFrame
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
