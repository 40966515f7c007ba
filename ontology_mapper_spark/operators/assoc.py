"""Association-rule mining over user→item engagement baskets.

The market-basket classic (Agrawal/Srikant a-priori, level 2) re-shaped
for Spark: baskets are the DISTINCT (user, item) pairs, candidate rules
come from ONE user-keyed self-join (a user with k distinct items emits
k·(k−1) directed pair rows — bounded by the item-catalog width squared
per user, never by the corpus), and every rule metric is a function of
four integer counts.  Directed rules (A→B ≠ B→A: confidence is
asymmetric) distinguish this from the symmetric cosine projection in
`graph.bipartite_cooccurrence` (qb28).

Exactness: confidence is one single micro division of int64 counts;
lift multiplies in DOUBLE space with each int64 operand exactly
representable (counts < 2^53) and a fixed mirrored op order, so both
engines produce bit-identical IEEE results (the qb13 discipline —
int64 products of user-scale counts would overflow at web scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def association_rules(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_support_count: int = 1,
) -> DataFrame:
    """Directed association rules antecedent→consequent with support /
    confidence / lift from distinct engagement baskets.

    * n_both       — users engaging BOTH items (support count)
    * conf_micro   — round(1e6 · n_both / n_antecedent)
    * lift_micro   — round(1e6 · n_both·n_baskets / (n_ant·n_con)),
                     computed in double with a fixed op order
                     (lift > 1e6 ⇔ positive association)

    Rules with n_both < ``min_support_count`` are pruned AFTER the
    count aggregate (the a-priori prune point: the pair count is the
    expensive product; everything after is dictionary-sized).

    Output: (antecedent, consequent, n_both, n_antecedent,
    n_consequent, conf_micro, lift_micro).
    """
    ui = df.select(
        F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
    ).distinct()
    n_baskets = ui.agg(
        F.countDistinct("_u").cast("long").alias("_n")
    )
    deg = ui.groupBy("_i").agg(F.count("*").cast("long").alias("_c"))
    a = ui.select("_u", F.col("_i").alias("antecedent"))
    b = ui.select("_u", F.col("_i").alias("consequent"))
    pairs = (
        a.join(b, "_u")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").cast("long").alias("n_both"))
        .where(F.col("n_both") >= int(min_support_count))
    )
    da = deg.select(
        F.col("_i").alias("antecedent"), F.col("_c").alias("n_antecedent")
    )
    db = deg.select(
        F.col("_i").alias("consequent"), F.col("_c").alias("n_consequent")
    )
    joined = (
        pairs.join(F.broadcast(da), "antecedent")
        .join(F.broadcast(db), "consequent")
        .join(F.broadcast(n_baskets))
    )
    return joined.select(
        "antecedent",
        "consequent",
        "n_both",
        "n_antecedent",
        "n_consequent",
        F.round(
            F.col("n_both") * F.lit(MICRO) / F.col("n_antecedent")
        )
        .cast("long")
        .alias("conf_micro"),
        F.round(
            F.col("n_both").cast("double")
            * F.col("_n").cast("double")
            * F.lit(float(MICRO))
            / (
                F.col("n_antecedent").cast("double")
                * F.col("n_consequent").cast("double")
            )
        )
        .cast("long")
        .alias("lift_micro"),
    )
