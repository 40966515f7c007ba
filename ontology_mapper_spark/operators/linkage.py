"""Blocked record linkage (Fellegi–Sunter-lite).

Entity resolution across two record sources is the step a KG build runs
BEFORE canonicalization: decide which (a, b) record pairs refer to the
same real-world entity, then feed the accepted pairs to connected
components (pipeline/canonicalize.py) as equivalence edges. The
reference resolves entities only by exact URI / lowercased-label
equality (utils/helpers.py:76-105 exact class; core/lookup.py dedup);
this operator generalizes that to the classic probabilistic-linkage
shape: cheap BLOCKING join + per-field agreement vector + integer
log-likelihood score (Fellegi & Sunter 1969, Newcombe 1959).

Scale contract:
* the quadratic term is bounded by the block: candidate pairs are one
  shuffled equi-join on the block key — never all-pairs. Pick block
  keys whose largest block is O(thousands); for skewed block keys route
  hot blocks through operators/skewjoin.py:hot_key_broadcast_join.
* scoring is a pure projection (when/otherwise sums) — no Python, no
  second shuffle; the threshold filter prunes before any downstream CC.
* weights are INTEGER milli-units (log-likelihood ratios pre-scaled by
  the caller); the score is a plain integer sum, so results are
  bit-stable in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_linkage(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    block_cols: list[str],
    compare_weights: dict[str, tuple[int, int]],
    threshold: int,
) -> DataFrame:
    """Candidate pairs from an equi-join on `block_cols`, scored by the
    per-field agreement vector: field f adds compare_weights[f][0]
    milli-units when a.f == b.f (null-safe), else compare_weights[f][1]
    (typically negative). Pairs scoring >= threshold survive.

    Output: (id_a, id_b, agree_<f>... as 0/1, score), one row per
    candidate pair — id_a from `a`, id_b from `b` (distinct namespaces;
    callers linking a source to itself should filter id_a < id_b).
    """
    fields = list(compare_weights)
    left = a.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
        *[F.col(f).alias(f"_fa_{f}") for f in fields],
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
        *[F.col(f).alias(f"_fb_{f}") for f in fields],
    )
    cand = left.join(right, [f"_ba_{c}" for c in block_cols])
    agree = [
        F.col(f"_fa_{f}").eqNullSafe(F.col(f"_fb_{f}")).cast("long").alias(f"agree_{f}")
        for f in fields
    ]
    scored = cand.select("id_a", "id_b", *agree).select(
        "id_a",
        "id_b",
        *[F.col(f"agree_{f}") for f in fields],
        sum(
            (
                F.when(F.col(f"agree_{f}") == 1, F.lit(int(w_agree))).otherwise(
                    F.lit(int(w_disagree))
                )
                for f, (w_agree, w_disagree) in compare_weights.items()
            ),
            start=F.lit(0),
        )
        .cast("long")
        .alias("score"),
    )
    return scored.where(F.col("score") >= int(threshold))
