"""Training-mixture allocation.

Curation pipelines end with a budgeting decision: given per-source
volume and a measured quality signal, how many tokens does each source
contribute to the training mix?  The greedy quality-ordered fill
(highest-quality source first, until the budget runs out) is the
closed-form solution to "maximize total quality subject to a token
budget" when quality is per-source constant — and it is pure window
arithmetic: ONE cumulative sum over the (quality desc, source) total
order, allocation = clamp(budget − cum_before, 0, tokens).  No
iteration, no driver logic; int64 end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def mixture_allocation(
    per_source: DataFrame,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    quality_col: str = "quality_micro",
    budget_num: int = 2,
    budget_den: int = 5,
) -> DataFrame:
    """Greedy quality-ordered token allocation under a total budget of
    (budget_num/budget_den) of the corpus.

    `per_source` = one row per source with an int64 token count and an
    int64 quality score (plug in any measured metric: mean perplexity,
    AUC-gated quality, dedup rate...).  The budget is integer:
    B = (total·num) div den.  Allocation order is (quality desc,
    source) — a TOTAL order, so the fill is engine-deterministic.

    Output per source: source, n_tokens, quality_micro, alloc_tokens,
    alloc_share_micro (of the budget; 0-row-safe), fill_rank.
    """
    base = per_source.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col(quality_col).cast("long").alias("quality_micro"),
    )
    worder = Window.orderBy(F.col("quality_micro").desc(), F.col("source"))
    wbefore = worder.rowsBetween(Window.unboundedPreceding, -1)
    staged = base.select(
        "source",
        "n_tokens",
        "quality_micro",
        F.expr(
            f"(sum(n_tokens) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND "
            f"UNBOUNDED FOLLOWING) * {int(budget_num)}) div {int(budget_den)}"
        ).alias("_budget"),
        F.coalesce(F.sum("n_tokens").over(wbefore), F.lit(0))
        .cast("long")
        .alias("_cum_before"),
        F.row_number().over(worder).cast("int").alias("fill_rank"),
    )
    alloc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("n_tokens"), F.col("_budget") - F.col("_cum_before")),
    )
    return staged.select(
        "source",
        "n_tokens",
        "quality_micro",
        alloc.cast("long").alias("alloc_tokens"),
        F.when(
            F.col("_budget") > 0,
            F.round(alloc * F.lit(MICRO) / F.col("_budget")).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("alloc_share_micro"),
        "fill_rank",
    )


def pareto_sources(
    per_source: DataFrame,
    source_col: str = "source",
    metric_cols: list[str] | None = None,
) -> DataFrame:
    """Skyline (Pareto-frontier) query over per-source metrics, all
    bigger-is-better: a source is dominated when some other source is
    >= on EVERY metric and > on at least one (Börzsönyi et al. 2001)
    — the multi-objective complement to `mixture_allocation`'s single
    quality score: sources off the frontier are never the right pick
    at any metric weighting.

    Sources are a small dimension by definition, so the dominance
    check is one broadcast self-join (n_sources² pairs of a tiny
    table) + a count — no block-nested-loop machinery needed at this
    cardinality, and the semantics are pure integer comparisons.

    Output per source: source, *metric_cols, n_dominators,
    is_pareto.
    """
    metric_cols = metric_cols or ["n_tokens", "quality_micro"]
    base = per_source.select(
        F.col(source_col).alias("source"),
        *[F.col(c).cast("long").alias(c) for c in metric_cols],
    )
    other = base.select(
        F.col("source").alias("_o"),
        *[F.col(c).alias(f"_o_{c}") for c in metric_cols],
    )
    ge_all = None
    gt_any = None
    for c in metric_cols:
        ge = F.col(f"_o_{c}") >= F.col(c)
        gt = F.col(f"_o_{c}") > F.col(c)
        ge_all = ge if ge_all is None else (ge_all & ge)
        gt_any = gt if gt_any is None else (gt_any | gt)
    dominated = (
        base.crossJoin(F.broadcast(other))
        .where((F.col("source") != F.col("_o")) & ge_all & gt_any)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_dominators"))
    )
    return (
        base.join(dominated, "source", "left")
        .select(
            "source",
            *metric_cols,
            F.coalesce("n_dominators", F.lit(0))
            .cast("long")
            .alias("n_dominators"),
        )
        .withColumn("is_pareto", F.col("n_dominators") == 0)
    )


def greedy_set_cover(
    df: DataFrame,
    set_col: str,
    item_col: str,
    k: int = 3,
) -> DataFrame:
    """Greedy maximum-coverage source selection: pick up to ``k``
    sources, each round choosing the source adding the MOST items not
    covered by everything already chosen (ties → lexicographically
    smallest source) — the classic (1−1/e)-approximation to the NP-hard
    optimum, and the data-DEPENDENT counterpart of qb34's fixed
    size-order marginal coverage.  This is the "which feeds do I
    actually need" decision for corpus mixture design.

    Each round is one distributed job: anti-join the distinct
    (set, item) index against the covered-item set, count per source,
    and take the argmax with orderBy().limit(1) (TakeOrderedAndProject
    — never a global rank window).  Only the single winning row is
    collected per round.  The (set, item) index is localCheckpointed
    ONCE so the k rounds never recompute tokenization (single-
    generation checkpoint — not the multi-generation loop pattern the
    Spark 4.1 bug forbids).  A source whose entire item set is already
    covered adds nothing and can never be chosen (its count row
    vanishes at the anti-join); if no candidate remains the loop stops
    early.

    Output (≤ k rows): (round, chosen, n_new, cum_covered).
    """
    spark = df.sparkSession
    si = (
        df.select(
            F.col(set_col).alias("_s"), F.col(item_col).alias("_i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = None
    chosen: list = []
    rows = []
    cum = 0
    for r in range(1, int(k) + 1):
        cand = si if covered is None else si.join(covered, "_i", "left_anti")
        if chosen:
            cand = cand.where(~F.col("_s").isin(chosen))
        top = (
            cand.groupBy("_s")
            .agg(F.count("*").cast("long").alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("_s").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        s_star, c_star = top[0]["_s"], int(top[0]["_c"])
        cum += c_star
        rows.append((r, s_star, c_star, cum))
        chosen.append(s_star)
        new_items = si.where(F.col("_s") == s_star).select("_i")
        covered = new_items if covered is None else covered.union(new_items)
    return spark.createDataFrame(
        rows, "round long, chosen string, n_new long, cum_covered long"
    )


def raking_weights(
    cur: DataFrame,
    ref: DataFrame,
    row_col: str,
    col_col: str,
    rounds: int = 2,
) -> DataFrame:
    """Raking / iterative proportional fitting: per-cell weights that
    pull the CURRENT corpus's (row x col) composition toward the
    REFERENCE corpus's marginals — the post-stratification reweighting
    step when a training mix drifted from the population it should
    match (the classic survey-weighting algorithm, here as the data-
    mixture corrector next to qb06's allocation).

    All arithmetic lives on the CELL table (rows x cols cells — a
    bounded dimension grid; the only full-table work is the two
    grouped counts).  Target margins are micro-mass integers
    M_r = round(T_r * N_cur * 1e6 / N_ref); each round rescales
    weights by one micro-rounded division per axis
    (w' = round(w * M / axis_mass)), the fixed-round unrolled form
    (qa90/qb05 discipline — rounding is part of the spec so both
    engines iterate bit-identically).  Margins absent from the
    reference drive weights to 0; axis masses of 0 keep the previous
    weight (guarded division).

    Output per cell: (row, col, n, w_micro, row_mass_micro,
    col_mass_micro) with masses AFTER the final round.
    """
    cells = (
        cur.select(F.col(row_col).alias("_r"), F.col(col_col).alias("_c"))
        .groupBy("_r", "_c")
        .agg(F.count("*").cast("long").alias("n"))
    )
    n_cur = cur.count()
    n_ref = ref.count()
    rt = (
        ref.select(F.col(row_col).alias("_r"))
        .groupBy("_r")
        .agg(F.count("*").cast("long").alias("_tr"))
        .select(
            "_r",
            F.round(F.col("_tr") * F.lit(int(n_cur)) * F.lit(MICRO)
                    / F.lit(int(n_ref))).cast("long").alias("_mr"),
        )
    )
    ct = (
        ref.select(F.col(col_col).alias("_c"))
        .groupBy("_c")
        .agg(F.count("*").cast("long").alias("_tc"))
        .select(
            "_c",
            F.round(F.col("_tc") * F.lit(int(n_cur)) * F.lit(MICRO)
                    / F.lit(int(n_ref))).cast("long").alias("_mc"),
        )
    )
    w = (
        cells.join(F.broadcast(rt), "_r", "left")
        .join(F.broadcast(ct), "_c", "left")
        .select(
            "_r",
            "_c",
            "n",
            F.coalesce(F.col("_mr"), F.lit(0)).alias("_mr"),
            F.coalesce(F.col("_mc"), F.lit(0)).alias("_mc"),
            F.lit(MICRO).cast("long").alias("_w"),
        )
    )
    wr = Window.partitionBy("_r")
    wc = Window.partitionBy("_c")
    for _ in range(int(rounds)):
        w = w.withColumn(
            "_rm", F.sum(F.col("n") * F.col("_w")).over(wr)
        ).withColumn(
            "_w",
            F.when(
                F.col("_rm") > 0,
                F.round(F.col("_w") * F.col("_mr") / F.col("_rm"))
                .cast("long"),
            ).otherwise(F.col("_w")),
        ).drop("_rm")
        w = w.withColumn(
            "_cm", F.sum(F.col("n") * F.col("_w")).over(wc)
        ).withColumn(
            "_w",
            F.when(
                F.col("_cm") > 0,
                F.round(F.col("_w") * F.col("_mc") / F.col("_cm"))
                .cast("long"),
            ).otherwise(F.col("_w")),
        ).drop("_cm")
    return w.select(
        F.col("_r").alias(row_col),
        F.col("_c").alias(col_col),
        "n",
        F.col("_w").alias("w_micro"),
        F.sum(F.col("n") * F.col("_w")).over(wr).cast("long")
        .alias("row_mass_micro"),
        F.sum(F.col("n") * F.col("_w")).over(wc).cast("long")
        .alias("col_mass_micro"),
    )


def concentration_panel(
    df: DataFrame,
    group_col: str,
    unit_col: str,
) -> DataFrame:
    """Source-concentration panel per group: Herfindahl-Hirschman
    index over unit shares, effective number of units (1/HHI), and
    top-1 / top-3 share — the "is this slice dominated by one source"
    dashboard row next to qb32's Lorenz/Gini (HHI is the
    concentration number procurement and mixture reviews quote).

    Exact arithmetic: with integer cell counts c and group total T,
    HHI = sum(c^2) / T^2 — both sums int64, ONE terminal micro
    division; effective_n_milli = 1000*T^2/sum(c^2) the same way.
    Top shares come from per-group rank over the (group, unit) count
    table (dimension-sized partitions).

    Output per group: (group, n_units, hhi_micro, effective_n_milli,
    top1_share_micro, top3_share_micro).
    """
    cells = (
        df.select(
            F.col(group_col).alias("_g"), F.col(unit_col).alias("_u")
        )
        .groupBy("_g", "_u")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    wr = Window.partitionBy("_g").orderBy(
        F.col("_c").desc(), F.col("_u").asc()
    )
    ranked = cells.select(
        "_g", "_c", F.row_number().over(wr).alias("_r")
    )
    agg = ranked.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum("_c").cast("long").alias("_t"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_cq"),
        F.sum(F.when(F.col("_r") == 1, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("_t1"),
        F.sum(F.when(F.col("_r") <= 3, F.col("_c")).otherwise(0))
        .cast("long")
        .alias("_t3"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n_units",
        F.round(F.col("_cq") * F.lit(MICRO) / (F.col("_t") * F.col("_t")))
        .cast("long")
        .alias("hhi_micro"),
        F.round(
            F.col("_t") * F.col("_t") * F.lit(1000) / F.col("_cq")
        )
        .cast("long")
        .alias("effective_n_milli"),
        F.round(F.col("_t1") * F.lit(MICRO) / F.col("_t"))
        .cast("long")
        .alias("top1_share_micro"),
        F.round(F.col("_t3") * F.lit(MICRO) / F.col("_t"))
        .cast("long")
        .alias("top3_share_micro"),
    )
