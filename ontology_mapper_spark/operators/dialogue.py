"""Dialogue-structure analytics over multi-turn transcripts.

The input is the north-rule transcript shape (conv_id, turn_idx, role,
text, tool, ts).  Curation of an agent-transcript corpus needs
structure-level signals the text operators can't see: degenerate
role loops (assistant→assistant runs from retry storms), tool-call
density, stalled conversations (huge inter-turn gaps).  Two operators:

* ``role_transition_matrix`` — first-order Markov transition counts
  over consecutive turns within a conversation, with a row-normalized
  micro-probability.  One shuffle (window by conv), then a bounded
  |roles|² aggregate.
* ``dialogue_shape`` — per-conversation shape row: turn counts by
  role, tool-turn count, wall-clock duration, and the mean inter-turn
  gap.  Single map-side-combinable groupBy per conv; time arithmetic
  in integer epoch micros end-to-end (contract.py exactness rules —
  the one IEEE division per output is terminal and micro-rounded).

At 10^12 turns both are one conv-keyed exchange; nothing is
driver-side and no per-row Python exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def role_transition_matrix(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
) -> DataFrame:
    """(prev_role, role, n, p_micro): consecutive-turn role transitions.

    ``p_micro`` = round(1e6 · n / Σ n over prev_role) — the transition
    probability as micro-fixed-point from exact bigint counts (one IEEE
    division, rounded immediately).
    """
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    trans = (
        df.select(
            F.col(conv_col),
            F.lag(role_col).over(w).alias("prev_role"),
            F.col(role_col).alias("role"),
        )
        .where(F.col("prev_role").isNotNull())
    )
    counts = trans.groupBy("prev_role", "role").agg(
        F.count("*").cast("long").alias("n")
    )
    row_tot = Window.partitionBy("prev_role")
    return counts.select(
        "prev_role",
        "role",
        "n",
        F.round((F.col("n") * MICRO).cast("double") / F.sum("n").over(row_tot))
        .cast("long")
        .alias("p_micro"),
    )


def dialogue_shape(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation structure row for corpus curation filters.

    Columns: conv_id, n_turns, n_user, n_assistant, n_tool_role,
    n_tool_calls (non-null tool), duration_us (last−first ts in epoch
    micros), mean_gap_us (duration/(n−1), micro-rounded; null for
    single-turn convs).  Because turns are contiguous in time, the mean
    inter-turn gap is duration/(n−1) without ever materializing lags.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    role = F.col(role_col)
    agg = df.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(role == "user", 1).otherwise(0)).cast("long").alias("n_user"),
        F.sum(F.when(role == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.when(role == "tool", 1).otherwise(0))
        .cast("long")
        .alias("n_tool_role"),
        F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        (F.max(us) - F.min(us)).cast("long").alias("duration_us"),
    )
    return agg.withColumn(
        "mean_gap_us",
        F.when(F.col("n_turns") > 1,
               F.round(F.col("duration_us").cast("double")
                       / (F.col("n_turns") - 1)).cast("long")),
    )


def turn_echo(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Per-turn echo of the PREVIOUS turn: |distinct-token ∩| / |tokens|.

    High echo = the model parroting the user (or a copy-paste loop) —
    a standard SFT-transcript quality gate.  One conv-keyed window
    (lag of the distinct-token array, computed once per turn), JVM
    array_intersect, no Python.  First turns (no predecessor) are
    excluded; empty-token turns yield null echo_micro.
    Columns: conv, order, n_tokens, n_echoed, echo_micro.
    """
    from .textstats import words_col

    w = Window.partitionBy(conv_col).orderBy(order_col)
    tok = df.select(
        F.col(conv_col),
        F.col(order_col),
        F.array_distinct(words_col(F.col(text_col))).alias("_toks"),
    )
    lagged = tok.withColumn("_prev", F.lag("_toks").over(w)).where(
        F.col("_prev").isNotNull()
    )
    sized = lagged.select(
        conv_col,
        order_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_intersect("_toks", "_prev")).cast("long").alias("n_echoed"),
    )
    return sized.withColumn(
        "echo_micro",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                (F.col("n_echoed") * MICRO).cast("double") / F.col("n_tokens")
            ).cast("long"),
        ),
    )
