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


def context_truncation_audit(
    df: DataFrame,
    conv_col: str,
    order_cols: "list[str]",
    tokens_col,
    budget: int,
) -> DataFrame:
    """Context-window truncation audit: if each conversation is
    assembled most-recent-first into a fixed token budget (the LLM
    serving/training convention qa15's assembly uses), how much
    history actually survives?  The capacity-planning companion to
    context assembly — run BEFORE committing to a max-sequence-length.

    A turn survives iff the running token total over turns NEWER than
    it (one DESC window over the conv key) stays within budget.  One
    conv-keyed shuffle; the report groups conversations by turn-count
    decade bucket (pow-10 of n_turns) so the answer reads "8% of turns
    drop in 10–99-turn convs, 71% in 1000+".

    Output per bucket: len_bucket (floor log10 decade), n_convs,
    n_turns, kept_turns, dropped_turns, drop_rate_micro,
    convs_truncated.
    """
    w = (
        Window.partitionBy("_c")
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(conv_col).alias("_c"),
        *[F.col(c) for c in order_cols],
        (
            tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
        ).cast("long").alias("_tok"),
    )
    kept = base.select(
        "_c",
        (F.sum("_tok").over(w) <= F.lit(int(budget))).cast("long").alias("_k"),
    )
    per_conv = kept.groupBy("_c").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_k").cast("long").alias("_kept"),
    )
    # decade via decimal-digit count (exact in any engine — floor(log10)
    # risks an off-by-one ulp at exact powers of ten)
    bucket = (F.length(F.col("_n").cast("string")) - 1).cast("long")
    agg = per_conv.groupBy(bucket.alias("len_bucket")).agg(
        F.count("*").cast("long").alias("n_convs"),
        F.sum("_n").cast("long").alias("n_turns"),
        F.sum("_kept").cast("long").alias("kept_turns"),
        F.sum(F.col("_n") - F.col("_kept")).cast("long").alias(
            "dropped_turns"
        ),
        F.sum((F.col("_kept") < F.col("_n")).cast("long"))
        .cast("long")
        .alias("convs_truncated"),
    )
    return agg.select(
        "len_bucket",
        "n_convs",
        "n_turns",
        "kept_turns",
        "dropped_turns",
        F.round(F.col("dropped_turns") * F.lit(MICRO) / F.col("n_turns"))
        .cast("long")
        .alias("drop_rate_micro"),
        "convs_truncated",
    )


def response_latency(
    df: DataFrame,
    conv_col: str,
    role_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Latency distribution per role transition (user→assistant is the
    answer-delay SLO; assistant→tool the act-delay; tool→assistant the
    tool round-trip) over conversation turns — exact type-1 percentiles
    from integer epoch-micro gaps, no t-digest needed because the
    distinct-gap table per transition is tiny next to the corpus.

    One conv-keyed window makes (prev_role, gap_us); per transition a
    total-order rank (gap, then the conv/tiebreak columns) turns
    p50/p90 into "the value at row ceil(q·n)" — deterministic in any
    engine.  Mean is one terminal division over a bigint sum.

    Output per (prev_role, role): n, mean_us, p50_us, p90_us, max_us.
    """
    w = Window.partitionBy("_c").orderBy("_ts", "_tb")
    base = df.select(
        F.col(conv_col).alias("_c"),
        F.col(role_col).alias("_r"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
    )
    gaps = base.select(
        F.lag("_r").over(w).alias("prev_role"),
        F.col("_r").alias("role"),
        (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.lag("_ts").over(w))
        ).alias("_g"),
        "_c",
        "_tb",
    ).where(F.col("prev_role").isNotNull())
    wr = Window.partitionBy("prev_role", "role").orderBy("_g", "_c", "_tb")
    wn = Window.partitionBy("prev_role", "role")
    ranked = gaps.select(
        "prev_role",
        "role",
        "_g",
        F.row_number().over(wr).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    idx50 = (F.col("_n") * 50 + 99) / 100
    idx90 = (F.col("_n") * 90 + 99) / 100
    agg = ranked.groupBy("prev_role", "role").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_g").cast("long").alias("_sg"),
        F.max(
            F.when(F.col("_rn") == F.floor(idx50).cast("long"), F.col("_g"))
        ).cast("long").alias("p50_us"),
        F.max(
            F.when(F.col("_rn") == F.floor(idx90).cast("long"), F.col("_g"))
        ).cast("long").alias("p90_us"),
        F.max("_g").cast("long").alias("max_us"),
    )
    return agg.select(
        "prev_role",
        "role",
        "n",
        F.round(F.col("_sg").cast("double") / F.col("n"))
        .cast("long")
        .alias("mean_us"),
        "p50_us",
        "p90_us",
        "max_us",
    )


def behavior_fingerprints(
    df,
    actor_col: str,
    action_col: str,
    order_cols,
    min_group: int = 2,
):
    """Behavioral-duplicate detection: actors whose ORDERED action
    sequence is identical -- the bot/replay signal (organic users don't
    share an exact 50-step trajectory) and the conversation-level dedup
    that turn-level text hashing misses.

    Per actor, the action sequence is assembled with the qa15 idiom --
    ``array_sort(collect_list(struct(order..., action)))`` so the sort
    is a deterministic in-group array sort, not a global orderBy -- and
    hashed; fingerprints shared by >= min_group actors come back with a
    capped summary (n_actors, n_actions, member min/max for drill-down,
    never the full sequence -- rows stay small at any scale).

    Output per duplicated fingerprint: fingerprint, n_actors,
    n_actions, actor_min, actor_max.
    """
    seq = (
        df.select(
            F.col(actor_col).alias("_a"),
            F.struct(
                *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
                F.col(action_col).alias("_act"),
            ).alias("_s"),
        )
        .groupBy("_a")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("_s")),
                        lambda s: s["_act"],
                    ),
                    "",
                )
            ).alias("fingerprint"),
            F.count("*").cast("long").alias("_n"),
        )
    )
    return (
        seq.groupBy("fingerprint")
        .agg(
            F.count("*").cast("long").alias("n_actors"),
            F.max("_n").cast("long").alias("n_actions"),
            F.min("_a").alias("actor_min"),
            F.max("_a").alias("actor_max"),
        )
        .where(F.col("n_actors") >= min_group)
    )


def markov_stationary(
    df: DataFrame,
    seq_col: str = "user_id",
    state_col: str = "event_type",
    order_cols=("ts", "event_id"),
    iters: int = 3,
) -> DataFrame:
    """Approximate stationary distribution of the behavior Markov chain
    — where user activity settles in steady state, from the same
    consecutive-transition counts as the qa13 role-transition matrix,
    via `iters` unrolled POWER-ITERATION rounds in pure int64 (the
    Bradley-Terry discipline: the state set is dictionary-sized, so
    each round is a broadcast join on a tiny table; truncating `div`
    matches DuckDB `//` bit-for-bit).

    P is row-stochastic in micro (each cell ONE rounded division of
    transition counts); v_{t+1}[j] = (Σ_i v_t[i]·p_ij) div 1e6.  The
    truncation drifts the mass below 1e6 by ≤ n_states per round —
    report the raw vector plus its renormalized share.

    Output per state: state, n_out (outgoing transitions),
    v_micro (raw iterated mass), stationary_micro (renormalized to
    sum 1e6), rank.
    """
    ordered = Window.partitionBy(F.col(seq_col)).orderBy(
        *[F.col(c) for c in order_cols]
    )
    trans = (
        df.select(
            F.col(seq_col).alias("_seq"),
            F.col(state_col).alias("_to"),
            F.lag(F.col(state_col), 1).over(ordered).alias("_from"),
        )
        .where(F.col("_from").isNotNull())
        .groupBy("_from", "_to")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    wrow = Window.partitionBy("_from")
    p = trans.withColumn(
        "_ntot", F.sum("_n").over(wrow).cast("long")
    ).select(
        "_from",
        "_to",
        "_ntot",
        F.round(F.col("_n") * F.lit(1_000_000) / F.col("_ntot"))
        .cast("long")
        .alias("_p"),
    )
    states = p.select(F.col("_from").alias("state")).distinct()
    # uniform start over the observed FROM-states (1e6 div k — truncating
    # div, same in both engines; the states table is dictionary-sized so
    # the unpartitioned count window is k rows)
    n_states_expr = F.count("*").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    v = states.withColumn("_k", n_states_expr.cast("long")).select(
        "state", F.expr("CAST(1000000 AS BIGINT) div _k").alias("_v")
    )
    for _ in range(iters):
        vin = v.select(F.col("state").alias("_from"), F.col("_v"))
        stepped = (
            p.join(F.broadcast(vin), "_from")
            .groupBy(F.col("_to").alias("state"))
            .agg(
                F.sum(F.col("_v") * F.col("_p")).cast("long").alias("_acc")
            )
            .select("state", F.expr("_acc div 1000000").cast("long").alias("_v"))
        )
        v = stepped
    nout = p.groupBy(F.col("_from").alias("state")).agg(
        F.max("_ntot").cast("long").alias("n_out")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wr = Window.orderBy(F.col("v_micro").desc(), F.col("state"))
    return (
        v.join(nout, "state", "left")
        .select(
            "state",
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
            F.col("_v").alias("v_micro"),
        )
        .withColumn(
            "stationary_micro",
            F.round(
                F.col("v_micro") * F.lit(1_000_000) / F.sum("v_micro").over(wall)
            ).cast("long"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("int"))
    )


def markov_entropy_rate(
    df: DataFrame,
    seq_col: str = "user_id",
    state_col: str = "event_type",
    order_cols=("ts", "event_id"),
    iters: int = 3,
) -> DataFrame:
    """Entropy rate of the behavior Markov chain, H = Σ_i π_i H_i with
    H_i = −Σ_j p_ij ln p_ij — the one-number predictability summary of
    user behavior (low = bots/scripted loops, high = organic), composing
    `markov_stationary`'s iterated mass with per-state transition
    entropy.

    Exactness: p_ij is the micro int from ONE rounded division; each
    −ln(p) is taken once per transition CELL on p_micro/1e6 (the qa66
    idiom); per-state entropy is an exact integer Σ p_micro·nl_micro
    (micro² scale); the corpus rate is ONE terminal double division of
    the π-weighted sum (cast before dividing — the weighted numerator
    approaches int64 at high entropy).

    Output per state: state, v_micro (stationary mass),
    h_state_micro (that state's outgoing entropy, micro-nats), and
    entropy_rate_micro (corpus-level, repeated).
    """
    pi = markov_stationary(df, seq_col, state_col, order_cols, iters).select(
        F.col("state"), F.col("v_micro")
    )
    ordered = Window.partitionBy(F.col(seq_col)).orderBy(
        *[F.col(c) for c in order_cols]
    )
    trans = (
        df.select(
            F.col(seq_col).alias("_seq"),
            F.col(state_col).alias("_to"),
            F.lag(F.col(state_col), 1).over(ordered).alias("_from"),
        )
        .where(F.col("_from").isNotNull())
        .groupBy("_from", "_to")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    wrow = Window.partitionBy("_from")
    p = trans.withColumn(
        "_ntot", F.sum("_n").over(wrow).cast("long")
    ).select(
        "_from",
        F.round(F.col("_n") * F.lit(1_000_000) / F.col("_ntot"))
        .cast("long")
        .alias("_p"),
    )
    nl = F.when(
        F.col("_p") > 0,
        F.round(
            F.lit(-1_000_000.0) * F.log(F.col("_p").cast("double") / 1_000_000)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    h = p.select("_from", (F.col("_p") * nl).alias("_ph")).groupBy(
        "_from"
    ).agg(F.sum("_ph").cast("long").alias("_hp"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = pi.join(h, pi["state"] == h["_from"], "left").select(
        "state",
        "v_micro",
        F.coalesce("_hp", F.lit(0)).cast("long").alias("_hp"),
    )
    # the π-weighted numerator stays an exact INT64 sum (never a double
    # sum — order-dependent): Σ v_i·h_i_p ≤ 1e12·ln(k)·1e6, inside int64
    # up to ~10k states; ONE terminal double division.
    return j.select(
        "state",
        "v_micro",
        F.round(F.col("_hp") / F.lit(1_000_000)).cast("long").alias(
            "h_state_micro"
        ),
        F.round(
            F.sum(F.col("v_micro") * F.col("_hp")).over(wall).cast("double")
            / (F.sum("v_micro").over(wall) * F.lit(1_000_000.0))
        )
        .cast("long")
        .alias("entropy_rate_micro"),
    )


def pattern_match_share(
    df,
    actor_col: str,
    action_col: str,
    order_cols,
    patterns: dict[str, str],
    initial_len: int = 1,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern matching over each actor's
    ORDERED action-initial string — the sequence-pattern engine Spark
    lacks natively (Flink/Trino ship MATCH_RECOGNIZE; here the per-actor
    trajectory is assembled once with the qa15
    ``array_sort(collect_list(struct(order..., initial)))`` idiom and
    every declared pattern is one JVM ``rlike`` over it).  Sequences are
    bounded by the per-actor action count, so the concat string is a
    session artifact, never corpus-sized.

    ``patterns`` maps name -> UNANCHORED regex over action initials
    (``substring(action, 1, initial_len)`` — callers pick initials that
    stay distinct).  Keep to the portable regex core (character
    classes, ``*``/``+``/``?``, alternation): it evaluates identically
    in any engine, which is what makes the report oracle-checkable.

    Output per pattern: (pattern, n_actors, n_match, share_micro).
    """
    from pyspark.sql import functions as F

    order_exprs = [F.col(c) for c in order_cols]
    seq = (
        df.select(
            F.col(actor_col).alias("_a"),
            F.struct(
                *order_exprs,
                F.substring(F.col(action_col), 1, int(initial_len)).alias(
                    "_i"
                ),
            ).alias("_st"),
        )
        .groupBy("_a")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("_st")), lambda s: s["_i"]
                ),
            ).alias("_s")
        )
    )
    # ONE scan for all patterns: explode the declared pattern table
    # against each session string (|patterns| x sessions rows, pattern
    # count is a declared constant)
    pat = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("pattern"), F.lit(rx).alias("_rx")
                )
                for n, rx in patterns.items()
            ]
        )
    )
    return (
        seq.select("_s", pat.alias("_p"))
        .select("_s", F.col("_p.pattern").alias("pattern"), "_p._rx")
        .groupBy("pattern")
        .agg(
            F.count("*").cast("long").alias("n_actors"),
            F.sum(F.when(F.expr("_s RLIKE _rx"), 1).otherwise(0))
            .cast("long")
            .alias("n_match"),
        )
        .withColumn(
            "share_micro",
            F.round(
                F.col("n_match") * F.lit(1_000_000) / F.col("n_actors")
            ).cast("long"),
        )
    )


def absorption_within_k(
    df: DataFrame,
    seq_col: str = "user_id",
    state_col: str = "event_type",
    order_cols=("ts", "event_id"),
    absorbing: tuple[str, ...] = ("purchase", "error"),
    k: int = 3,
) -> DataFrame:
    """Absorbing-chain analysis on the behavior Markov chain: the
    probability of reaching each ABSORBING state within k steps from
    each transient state — "how close is every journey state to a
    sale or a failure", the absorbing companion to qb05's stationary
    mass and qb12's entropy rate.

    Transition matrix P from the same consecutive-transition counts
    (row-stochastic micro cells, one rounded division each); with Q =
    transient->transient and R = transient->absorbing blocks, the
    k-step absorption matrix is M_k = R + Q.M_{k-1}, unrolled k-1
    times in pure int64 on the dictionary-sized state tables
    (products accumulate exactly; each round ends in ONE truncating
    div 1e6, the qa90/qb05 fixed-point discipline — DuckDB `//`
    bit-parity).

    Output per (transient state, absorbing state): (state,
    absorbing_state, n_out, p_absorb_micro).
    """
    ordered = Window.partitionBy(F.col(seq_col)).orderBy(
        *[F.col(c) for c in order_cols]
    )
    trans = (
        df.select(
            F.col(seq_col).alias("_seq"),
            F.col(state_col).alias("_to"),
            F.lag(F.col(state_col), 1).over(ordered).alias("_from"),
        )
        .where(F.col("_from").isNotNull())
        # journeys END at an absorbing state: drop transitions leaving
        # one (the chain restarting is a new journey, not an escape)
        .where(~F.col("_from").isin(*absorbing))
        .groupBy("_from", "_to")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    wrow = Window.partitionBy("_from")
    p = trans.withColumn(
        "_ntot", F.sum("_n").over(wrow).cast("long")
    ).select(
        "_from",
        "_to",
        "_ntot",
        F.round(F.col("_n") * F.lit(1_000_000) / F.col("_ntot"))
        .cast("long")
        .alias("_p"),
    )
    r = p.where(F.col("_to").isin(*absorbing)).select(
        "_from", F.col("_to").alias("_abs"), F.col("_p").alias("_r")
    )
    q = p.where(~F.col("_to").isin(*absorbing)).select(
        F.col("_from").alias("_qf"),
        F.col("_to").alias("_qt"),
        F.col("_p").alias("_q"),
    )
    m = r.select("_from", "_abs", F.col("_r").alias("_m"))
    for _ in range(int(k) - 1):
        stepped = (
            q.join(
                m.select(
                    F.col("_from").alias("_qt"),
                    "_abs",
                    F.col("_m").alias("_mprev"),
                ),
                "_qt",
            )
            .groupBy(F.col("_qf").alias("_from"), "_abs")
            .agg(
                F.sum(F.col("_q") * F.col("_mprev"))
                .cast("long")
                .alias("_acc")
            )
            .select(
                "_from",
                "_abs",
                F.expr("_acc div 1000000").cast("long").alias("_qm"),
            )
        )
        m = (
            r.join(stepped, ["_from", "_abs"], "full")
            .select(
                "_from",
                "_abs",
                (
                    F.coalesce(F.col("_r"), F.lit(0))
                    + F.coalesce(F.col("_qm"), F.lit(0))
                )
                .cast("long")
                .alias("_m"),
            )
        )
    nout = p.groupBy(F.col("_from").alias("state")).agg(
        F.max("_ntot").cast("long").alias("n_out")
    )
    return (
        m.select(
            F.col("_from").alias("state"),
            F.col("_abs").alias("absorbing_state"),
            F.col("_m").alias("p_absorb_micro"),
        )
        .join(nout, "state")
        .select("state", "absorbing_state", "n_out", "p_absorb_micro")
    )
