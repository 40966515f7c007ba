"""Pairwise-preference ranking operators (Bradley-Terry).

RLHF-style pipelines reduce "which response is better" judgments to
pairwise duels and need item strengths back out of them.  The classic
estimator is the Bradley-Terry model fit by Hunter's MM iteration
(Hunter 2004, "MM algorithms for generalized Bradley-Terry models"):

    w_i  <-  W_i / sum_j  n_ij / (w_i + w_j)

where W_i = total wins of item i and n_ij = number of duels between
i and j.  The duel matrix is the big-data part (one shuffle over the
raw comparisons); the iteration itself runs on the items table, which
is dictionary-sized (event types, model variants, prompt templates —
never corpus-sized), as a fixed number of unrolled relational rounds —
the same unrolled-round discipline as operators/retrieval.py:mmr_rerank
and the kmeans oracle.

Hash-exactness: every round is pure int64 arithmetic.  Strengths are
micro-fixed-point; the per-duel term uses truncating integer division
    (n_ij * 1e12) div (w_i + w_j)
which both engines define identically for non-negative operands
(Spark `div` ≡ DuckDB `//` toward zero), so a DuckDB oracle can chain
the rounds as CTEs and match bit-for-bit.  No double ever enters the
loop.  Scale bounds: n_ij * 1e12 stays under int64 for n_ij < 9.2e6
duels per cell — cells are per item-PAIR counts, so this holds far
past 100 TB of raw comparisons (guarded below anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000
_TERA = 1_000_000_000_000


def duel_matrix(
    duels: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Aggregate raw (winner, loser) rows into the undirected duel-cell
    table the MM iteration consumes: one row per unordered pair
    (a < b) with total duels and wins for the lexicographically
    smaller item.  ONE shuffle on the pair key with map-side combine.

    Output: (item_a, item_b, n_duels, wins_a) with item_a < item_b.
    """
    w, l = F.col(winner_col), F.col(loser_col)
    cells = (
        duels.select(
            F.least(w, l).alias("item_a"),
            F.greatest(w, l).alias("item_b"),
            (w < l).cast("long").alias("_win_a"),
        )
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n_duels"),
            F.sum("_win_a").cast("long").alias("wins_a"),
        )
    )
    return cells


def bradley_terry_strengths(
    cells: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Bradley-Terry strengths from a duel-cell table via `rounds`
    unrolled integer MM iterations (docstring above for the identity
    and the cross-engine exactness argument).

    `cells` = (item_a, item_b, n_duels, wins_a) as produced by
    `duel_matrix`.  Items whose win count is 0 or all-wins survive the
    fixed rounds fine (the unregularized MM would only diverge in the
    limit).  Items with no duels at all simply don't appear.

    Output per item: item, n_duels (total matches), n_wins,
    strength_micro (final w, micro scale), p_micro (strength
    normalized to sum 1e6 over items), rank (1 = strongest, ties on
    strength broken by item).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    # directed duels: one row per (i, j) direction with i's win count
    directed = cells.select(
        F.col("item_a").alias("i"),
        F.col("item_b").alias("j"),
        F.col("n_duels").cast("long").alias("n"),
        F.col("wins_a").cast("long").alias("w"),
    ).unionByName(
        cells.select(
            F.col("item_b").alias("i"),
            F.col("item_a").alias("j"),
            F.col("n_duels").cast("long").alias("n"),
            (F.col("n_duels") - F.col("wins_a")).cast("long").alias("w"),
        )
    )
    totals = directed.groupBy("i").agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("w").cast("long").alias("n_wins"),
    )
    # w0: everyone at 1e6.  The items table is dictionary-sized, so the
    # per-round joins below are broadcast-sized by construction.
    w_cur = totals.select("i", F.lit(MICRO).cast("long").alias("wv"))
    for _ in range(rounds):
        wi = w_cur.select(F.col("i"), F.col("wv").alias("_wi"))
        wj = w_cur.select(F.col("i").alias("j"), F.col("wv").alias("_wj"))
        terms = (
            directed.join(F.broadcast(wi), "i")
            .join(F.broadcast(wj), "j")
            .select(
                "i",
                F.expr(
                    f"(n * CAST({_TERA} AS BIGINT)) div (_wi + _wj)"
                ).alias("_t"),
            )
        )
        s = terms.groupBy("i").agg(F.sum("_t").cast("long").alias("_s"))
        # clamp BOTH the denominator sum and the updated weight to >= 1
        # micro-unit: a winless item's exact MM update is 0, which would
        # zero the next round's (_wi + _wj) denominator for a duel between
        # two winless items (ANSI div-by-zero), and a denominator that
        # truncates to 0 would divide by zero here.  Every item in
        # `totals` therefore survives all rounds and appears in the
        # output (no silent drops).  1e-6 is the numeric floor, not a
        # semantic change — BT sends such items to 0 in the limit anyway.
        w_cur = s.join(totals.select("i", "n_wins"), "i").select(
            "i",
            F.greatest(
                F.expr(
                    f"(n_wins * CAST({_TERA} AS BIGINT))"
                    " div greatest(_s, CAST(1 AS BIGINT))"
                ),
                F.lit(1),
            )
            .cast("long")
            .alias("wv"),
        )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wr = Window.orderBy(F.col("strength_micro").desc(), F.col("item"))
    out = (
        totals.join(w_cur, "i")
        .select(
            F.col("i").alias("item"),
            F.col("n_total").alias("n_duels"),
            "n_wins",
            F.col("wv").alias("strength_micro"),
        )
        .withColumn(
            "p_micro",
            F.round(
                F.col("strength_micro")
                * F.lit(MICRO)
                / F.sum("strength_micro").over(wall)
            ).cast("long"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("int"))
    )
    return out
