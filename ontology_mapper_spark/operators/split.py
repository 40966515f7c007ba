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
