"""Skew-aware join helpers: explicit hot-key mitigation beyond AQE.

Spark already gives two free layers against skew: algebraic aggregations
get map-side partial aggregation (the "salting" two-phase trick, done
automatically for min/max/sum/count), and AQE's skew-join splits oversized
sort-merge partitions at runtime. What neither covers well is a FAN-IN
join where one key on the big side matches a single small-side row but
carries a double-digit percentage of all rows (a hub node in an identity
graph, a boilerplate shingle, an empty-string key): AQE can split the big
partition, but every split still shuffles — the hub's rows all move.

`hot_key_broadcast_join` removes that shuffle entirely for the hot keys:

  1. find the hot keys with one aggregate over the big side (map-side
     combine collapses them before the shuffle, so this pass is cheap and
     skew-immune by construction);
  2. route big-side rows: hot → map-side broadcast-hash join against the
     (tiny, because few keys are hot) hot slice of the small side — the
     hub's rows never leave their input partitions; cold → the normal
     shuffle join, now with its worst key removed;
  3. union the two halves (same schema, no further shuffle).

Determinism: the split is a pure function of the data (degree threshold),
and both halves are plain inner joins — the union's row SET equals the
plain join's exactly (asserted by tests/test_skewjoin.py on the full
result, not a sample).

For non-algebraic aggregations (collect_list/collect_set over a hot key),
`salted_two_phase_agg` provides classic explicit salting: a deterministic
salt from a row hash fans the hot key over `salt_n` reducers for a partial
aggregate, then a second (now small: salt_n rows per key) aggregate merges.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str | Sequence[str], threshold: int) -> DataFrame:
    """Keys whose big-side multiplicity exceeds `threshold`.

    One groupBy-count over the big side — safe at any skew because count is
    algebraic (map-side combine collapses the hot key per input partition
    before the shuffle)."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_deg"))
        .where(F.col("_deg") > threshold)
        .select(*keys)
    )


def hot_key_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str | Sequence[str],
    hot_threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join `big ⋈ small` on `key`, with keys hotter than
    `hot_threshold` on the big side served by a broadcast-hash join (zero
    shuffle for the hub's rows) and the rest by the regular join.

    `small` must be one-row-per-key on the hot keys (an identity/label
    table); with duplicates the union is still correct for `inner` but the
    hot slice must stay broadcast-sized. Only `inner` and `left` are
    supported — the split changes null-production for right/full."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}; use inner or left")
    keys = [key] if isinstance(key, str) else list(key)
    hot = F.broadcast(hot_keys(big, keys, hot_threshold))
    big_hot = big.join(hot, keys, "left_semi")
    big_cold = big.join(hot, keys, "left_anti")
    small_hot = F.broadcast(small.join(hot, keys, "left_semi"))
    return big_hot.join(small_hot, keys, how).unionByName(
        big_cold.join(small, keys, how)
    )


def salted_two_phase_agg(
    df: DataFrame,
    key: str | Sequence[str],
    partial: Callable[[], list[Column]],
    merge: Callable[[], list[Column]],
    salt_n: int = 32,
) -> DataFrame:
    """Two-phase aggregation with an explicit deterministic salt, for
    aggregates Spark cannot partially aggregate map-side (collect_list,
    collect_set, percentile_approx merges, ...).

    Phase 1 groups by (key, salt) where salt = pmod(xxhash64(whole row),
    salt_n) — deterministic (no rand(), per the repo's purity invariant),
    spreading a hot key over `salt_n` reducers. Phase 2 groups by key alone
    over the ≤salt_n partial rows per key. `partial()` / `merge()` return
    the aggregate columns for each phase (fresh Column objects each call)."""
    keys = [key] if isinstance(key, str) else list(key)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_n)))
    p = salted.groupBy(*keys, "_salt").agg(*partial())
    return p.groupBy(*keys).agg(*merge())
