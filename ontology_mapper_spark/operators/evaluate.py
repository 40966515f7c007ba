"""Retrieval-quality evaluation operators.

An ANN index (operators/similarity.py) is only as good as its measured
recall; a 100 TB pipeline runs that measurement as a first-class
distributed job (sampled queries, exact top-k vs index top-k), not as a
notebook afterthought. tests/test_ann_recall.py proves the recall bounds
in-process; `topk_recall` is the same computation as a DataFrame operator
so it can run at corpus scale and land in the metrics table
(pipeline/runner.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result set against the
    exact top-k: |approx ∩ exact| / |exact|, in integer micro units.

    Both inputs are (query, id, ...) top-k tables — k rows per query.
    The intersection is ONE equi-join on (query, id); per-query counts
    are integer, recall has one terminal division. Queries are the
    sampled evaluation set, so both sides are small relative to the
    corpus — but nothing here collects, so a full-corpus self-recall
    run is just a bigger join.

    Output: (query, k_exact, n_hit, recall_micro).
    """
    ex = exact.select(F.col(query_col), F.col(id_col))
    ap = approx.select(
        F.col(query_col), F.col(id_col), F.lit(1).alias("_hit")
    )
    joined = ex.join(ap, [query_col, id_col], "left")
    per = joined.groupBy(query_col).agg(
        F.count("*").cast("long").alias("k_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
    )
    return per.select(
        query_col,
        "k_exact",
        "n_hit",
        F.round((F.col("n_hit") * MICRO).cast("double") / F.col("k_exact"))
        .cast("long")
        .alias("recall_micro"),
    )


def pr_sweep(
    scored: DataFrame,
    gold: DataFrame,
    key_cols: list[str],
    score_col: str = "score_micro",
) -> DataFrame:
    """Precision/recall/F1 at every distinct score threshold — the curve
    that picks a link-acceptance cutoff (the north-rule P/R >= 0.95
    criterion is one point on it; pipeline/link_score.py's rank-1 policy
    is another).

    `scored` = candidate predictions with key columns + a bigint score;
    `gold` = the accepted reference set (deduplicated on the keys).
    TP marking is ONE left join on the keys; per-threshold counts come
    from a groupBy on the score, and the cumulative "predict everything
    >= t" totals from a window over the DISTINCT-score table ordered by
    score desc — score-domain-sized (bucket scores first if the domain
    is not small; here it is decision-table-sized). Counts are integers;
    precision, recall, and F1 are each ONE terminal division — F1 uses
    the identity F1 = 2*TP / (n_pred + n_gold), which stays a single
    division of exact integers.

    Output: (threshold_micro, n_pred, n_tp, n_gold, precision_micro,
    recall_micro, f1_micro), one row per distinct score, descending
    thresholds accumulate.
    """
    from pyspark.sql import Window

    g = gold.select(*key_cols).distinct()
    n_gold = g.count()
    marked = scored.select(
        F.col(score_col).alias("_s"), *[F.col(c) for c in key_cols]
    ).join(g.withColumn("_hit", F.lit(1)), key_cols, "left")
    per = marked.groupBy("_s").agg(
        F.count("*").cast("long").alias("_np"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("_nt"),
    )
    w = Window.orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        F.col("_s").alias("threshold_micro"),
        F.sum("_np").over(w).cast("long").alias("n_pred"),
        F.sum("_nt").over(w).cast("long").alias("n_tp"),
        F.lit(int(n_gold)).cast("long").alias("n_gold"),
    )
    return cum.select(
        "threshold_micro",
        "n_pred",
        "n_tp",
        "n_gold",
        F.round((F.col("n_tp") * MICRO).cast("double") / F.col("n_pred"))
        .cast("long")
        .alias("precision_micro"),
        F.round((F.col("n_tp") * MICRO).cast("double") / F.col("n_gold"))
        .cast("long")
        .alias("recall_micro"),
        F.round(
            (F.col("n_tp") * 2 * MICRO).cast("double")
            / (F.col("n_pred") + F.col("n_gold"))
        )
        .cast("long")
        .alias("f1_micro"),
    )


def pair_set_metrics(
    cand: DataFrame,
    truth: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Candidate-set recall AND precision against a ground-truth pair set
    — the two numbers that tune an LSH banding scheme (more bands/tables
    raise recall, fewer raise precision; Leskovec et al. ch.3). Works
    for any keyed sets, not just pairs.

    ONE full-outer join on the keys, one global aggregate; recall and
    precision are each a single terminal division of exact counts.

    Output: one row (n_truth, n_cand, n_hit, recall_micro,
    precision_micro).
    """
    c = cand.select(*key_cols).distinct().withColumn("_fc", F.lit(1))
    t = truth.select(*key_cols).distinct().withColumn("_ft", F.lit(1))
    j = c.join(t, key_cols, "full").select(
        F.coalesce(F.col("_fc"), F.lit(0)).alias("_fc"),
        F.coalesce(F.col("_ft"), F.lit(0)).alias("_ft"),
    )
    agg = j.agg(
        F.sum("_ft").cast("long").alias("n_truth"),
        F.sum("_fc").cast("long").alias("n_cand"),
        F.sum(F.col("_fc") * F.col("_ft")).cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_truth",
        "n_cand",
        "n_hit",
        F.round((F.col("n_hit") * MICRO).cast("double") / F.col("n_truth"))
        .cast("long")
        .alias("recall_micro"),
        F.round((F.col("n_hit") * MICRO).cast("double") / F.col("n_cand"))
        .cast("long")
        .alias("precision_micro"),
    )


def roc_auc(
    df: DataFrame,
    group_col: str,
    score_col,
    label_col,
) -> DataFrame:
    """Per-group ROC-AUC of an integer score against a boolean label,
    tie-correct and hash-exact — the one-number check that a quality /
    classifier score actually ranks positives above negatives before it
    gates a corpus at scale.

    Uses the Mann-Whitney identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) on
    midranks, via the repo's doubled-midrank histogram trick (qa22):
    group by distinct score value, doubled midrank = 2·cum_before +
    c_total + 1 stays integer under ties, so

        auc = (Σ_pos 2·midrank − 2·n₁·(n₁+1)/2) / (2·n₁·n₀)

    is a single integer division micro-rounded at the end; Gini (2·AUC
    − 1) follows by integer arithmetic.  Cost: one (group, score)
    count + one window over the same partitioning + one group agg —
    the score histogram is tiny regardless of corpus size.

    Output per group: n_pos, n_neg, u2 (doubled Mann-Whitney U,
    bigint), auc_micro, gini_micro (NULL when either class is empty).
    """
    hist = (
        df.select(
            F.col(group_col).alias("_g"),
            (score_col if not isinstance(score_col, str) else F.col(score_col))
            .cast("long")
            .alias("_v"),
            (label_col if not isinstance(label_col, str) else F.col(label_col))
            .cast("boolean")
            .alias("_y"),
        )
        .groupBy("_g", "_v")
        .agg(
            F.count("*").cast("long").alias("_c"),
            F.sum(F.col("_y").cast("long")).cast("long").alias("_c1"),
        )
    )
    w = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.select(
        "_g",
        "_c",
        "_c1",
        (
            F.coalesce(F.sum("_c").over(w), F.lit(0)) * 2
            + F.col("_c")
            + 1
        ).alias("_mr2"),
    )
    agg = ranked.groupBy("_g").agg(
        F.sum("_c1").cast("long").alias("n_pos"),
        F.sum(F.col("_c") - F.col("_c1")).cast("long").alias("n_neg"),
        F.sum(F.col("_c1") * F.col("_mr2")).cast("long").alias("_r1_2"),
    )
    u2 = F.col("_r1_2") - F.col("n_pos") * (F.col("n_pos") + 1)
    auc = F.round(u2 * F.lit(1_000_000) / (F.col("n_pos") * F.col("n_neg") * 2))
    nonempty = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        F.col("_g").alias(group_col),
        "n_pos",
        "n_neg",
        F.when(nonempty, u2).cast("long").alias("u2"),
        F.when(nonempty, auc).cast("long").alias("auc_micro"),
        F.when(nonempty, auc.cast("long") * 2 - 1_000_000)
        .cast("long")
        .alias("gini_micro"),
    )


def calibration_report(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error for a bounded
    integer score against a boolean outcome — the calibration
    complement to `roc_auc`'s discrimination: a score can rank
    perfectly (AUC 1) yet lie about probabilities; gating on it as if
    calibrated then mis-sizes every downstream quota.

    The score range is split into n_bins equi-width bins (global
    min/max via a broadcast single-row agg; bin index is pure integer
    arithmetic so both engines agree at bin edges); each bin's implied
    confidence is its midpoint (2b+1)/(2·n_bins).  Everything is exact:
    acc and conf in micro-ints, the ECE numerator Σ n_b·|acc−conf| an
    integer sum, ONE terminal division.

    Output per bin: bin, n, conf_micro, acc_micro, gap_micro, and
    ece_micro (corpus-level, repeated per row for a single-table read).
    """
    base = df.select(
        (
            score_col if not isinstance(score_col, str) else F.col(score_col)
        ).cast("long").alias("_s"),
        (
            label_col if not isinstance(label_col, str) else F.col(label_col)
        ).cast("boolean").alias("_y"),
    )
    ext = base.agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("_s") - F.col("_mn"))
            * F.lit(int(n_bins))
            / (F.col("_mx") - F.col("_mn") + 1)
        ).cast("long").alias("bin"),
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("_y").cast("long")).cast("long").alias("_pos"),
    )
    conf = (F.col("bin") * 2 + 1) * F.lit(500_000 // n_bins)
    acc = F.round(F.col("_pos") * F.lit(1_000_000) / F.col("n")).cast("long")
    staged = per.select(
        "bin",
        "n",
        conf.cast("long").alias("conf_micro"),
        acc.alias("acc_micro"),
    ).select(
        "bin",
        "n",
        "conf_micro",
        "acc_micro",
        F.abs(F.col("acc_micro") - F.col("conf_micro")).cast("long").alias(
            "gap_micro"
        ),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return staged.select(
        "bin",
        "n",
        "conf_micro",
        "acc_micro",
        "gap_micro",
        F.round(
            F.sum(F.col("n") * F.col("gap_micro")).over(wall)
            / F.sum("n").over(wall)
        )
        .cast("long")
        .alias("ece_micro"),
    )


def multiclass_report(
    df: DataFrame,
    actual_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 + accuracy + macro-F1 for a
    multiclass prediction column — the confusion-matrix rollup that
    turns q51's language guesser (or any heuristic classifier) into a
    monitored component instead of folklore.

    Exactness: F1 collapses to the single-division identity
    2·TP/(n_actual + n_pred), so per-class scores are one integer
    division each; accuracy is diag-sum over N; macro-F1 averages the
    per-class INTEGER f1s (never a double sum).  The label table is
    distinct(actual) ∪ distinct(pred), so classes that are only ever
    predicted (or only ever true) still report.

    Output per label: label, n_actual, n_pred, tp, p_micro, r_micro,
    f1_micro, accuracy_micro (global, repeated), macro_f1_micro
    (global, repeated).
    """
    base = df.select(
        F.col(actual_col).alias("_a"), F.col(pred_col).alias("_p")
    )
    actuals = base.groupBy(F.col("_a").alias("label")).agg(
        F.count("*").cast("long").alias("n_actual")
    )
    preds = base.groupBy(F.col("_p").alias("label")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    tps = (
        base.where(F.col("_a") == F.col("_p"))
        .groupBy(F.col("_a").alias("label"))
        .agg(F.count("*").cast("long").alias("tp"))
    )
    labels = (
        actuals.select("label")
        .unionByName(preds.select("label"))
        .distinct()
    )
    j = (
        labels.join(actuals, "label", "left")
        .join(preds, "label", "left")
        .join(tps, "label", "left")
        .select(
            "label",
            F.coalesce("n_actual", F.lit(0)).cast("long").alias("n_actual"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    p = F.when(
        F.col("n_pred") > 0,
        F.round(F.col("tp") * F.lit(1_000_000) / F.col("n_pred")).cast("long"),
    )
    r = F.when(
        F.col("n_actual") > 0,
        F.round(F.col("tp") * F.lit(1_000_000) / F.col("n_actual")).cast(
            "long"
        ),
    )
    f1 = F.round(
        F.col("tp") * F.lit(2_000_000) / (F.col("n_actual") + F.col("n_pred"))
    ).cast("long")
    staged = j.select(
        "label", "n_actual", "n_pred", "tp",
        p.alias("p_micro"), r.alias("r_micro"), f1.alias("f1_micro"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return staged.select(
        "label",
        "n_actual",
        "n_pred",
        "tp",
        "p_micro",
        "r_micro",
        "f1_micro",
        F.round(
            F.sum("tp").over(wall) * F.lit(1_000_000)
            / F.sum("n_actual").over(wall)
        )
        .cast("long")
        .alias("accuracy_micro"),
        F.round(F.sum("f1_micro").over(wall) / F.count("*").over(wall))
        .cast("long")
        .alias("macro_f1_micro"),
    )


def cuped_adjustment(
    df: DataFrame,
    unit_col: str,
    metric_col,
    ts_col: str = "ts",
) -> DataFrame:
    """CUPED variance-reduction audit (Deng et al. 2013): how much
    experiment variance would the pre-period covariate remove?  Splits
    the time range at its midpoint, builds per-unit (pre, post) metric
    sums, and reports θ = cov/var(pre), the pre/post correlation, and
    the achievable variance reduction corr² — the number that says
    whether running CUPED is worth the plumbing BEFORE any experiment
    ships.

    Per-unit sums are exact bigints (the metric is floored to integer
    units first — floor is engine-exact on doubles where round is not);
    cov/var/corr are one terminal double DAG over five bigint sums.
    Two shuffles: per-unit rollup, single-row fold.

    Output (single row): n_units, theta_micro, corr_micro,
    var_reduction_micro (NULL when either variance is 0).
    """
    ext = df.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("_lo"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("_hi"),
    )
    base = df.crossJoin(F.broadcast(ext)).select(
        F.col(unit_col).alias("_u"),
        F.floor(
            metric_col if not isinstance(metric_col, str) else F.col(metric_col)
        ).cast("long").alias("_m"),
        (
            F.unix_micros(F.col(ts_col).cast("timestamp")) * 2
            < F.col("_lo") + F.col("_hi")
        ).alias("_pre"),
    )
    per_unit = base.groupBy("_u").agg(
        F.sum(F.when(F.col("_pre"), F.col("_m")).otherwise(0))
        .cast("long")
        .alias("_x"),
        F.sum(F.when(~F.col("_pre"), F.col("_m")).otherwise(0))
        .cast("long")
        .alias("_y"),
    )
    s = per_unit.agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
    )
    n = F.col("n_units")
    cov = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    varx = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    vary = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    ok = (varx > 0.0) & (vary > 0.0)
    return s.select(
        "n_units",
        F.when(ok, F.round(cov * 1_000_000 / varx).cast("long")).alias(
            "theta_micro"
        ),
        F.when(
            ok,
            F.round(cov * 1_000_000 / F.sqrt(varx * vary)).cast("long"),
        ).alias("corr_micro"),
        F.when(
            ok,
            F.round(cov * cov * 1_000_000 / (varx * vary)).cast("long"),
        ).alias("var_reduction_micro"),
    )


def ndcg_discounts_micro(k: int) -> list[int]:
    """Integer micro discount table for NDCG: dm[p-1] = round(1e6 *
    ln(2)/ln(p+1)) for positions 1..k.  Computed ONCE in Python and
    injected as literals into BOTH the Spark plan and any SQL oracle,
    so no engine ever evaluates a transcendental — the cross-engine
    exactness is by construction, not by ulp luck."""
    import math

    return [round(MICRO * math.log(2) / math.log(p + 1)) for p in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    group_col: str,
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-group NDCG@k over an already-ranked result table with integer
    graded relevance — the ranking-quality metric `topk_recall` can't
    see (recall treats rank 1 and rank k alike; NDCG pays log-discounted
    credit by position, Järvelin & Kekäläinen 2002).

    DCG = Σ rel·dm(rank) with dm the precomputed integer micro discount
    (ndcg_discounts_micro); IDCG re-ranks the SAME relevance multiset
    descending (tiebreak: original rank — a total order) through the
    same table.  Both are exact int64 sums; NDCG is ONE terminal
    division.  Cost: one per-group window + one group agg — no join,
    no Python.

    Output per group: group, dcg_micro, idcg_micro, ndcg_micro (NULL
    when idcg is 0) and mean_ndcg_micro (over groups with idcg>0,
    repeated on every row for a single-table read).

    `rank_col` is expected to be a unique 1..k position within each
    group.  Duplicate ranks are tolerated (no ANSI error): every
    duplicate row still earns DCG credit at its stated position, and
    IDCG credits only the first k rows of the re-ranked multiset.
    """
    dm = ndcg_discounts_micro(k)
    disc = F.element_at(
        F.array(*[F.lit(int(d)).cast("long") for d in dm]), F.col("_r").cast("int")
    )
    base = ranked.select(
        F.col(group_col).alias("_g"),
        F.col(rank_col).cast("long").alias("_r"),
        F.col(rel_col).cast("long").alias("_rel"),
    ).where(F.col("_r") <= k)
    wi = Window.partitionBy("_g").orderBy(F.col("_rel").desc(), F.col("_r"))
    staged = base.select(
        "_g",
        "_rel",
        (F.col("_rel") * disc).alias("_dg"),
        F.row_number().over(wi).cast("long").alias("_ir"),
    )
    # try_element_at, not element_at: if a caller passes NON-unique ranks,
    # more than k rows survive the rank<=k filter and _ir exceeds k — the
    # ideal-ranking discount is then null (row beyond the IDCG@k window,
    # excluded from the sum) rather than an ANSI INVALID_ARRAY_INDEX.
    # With the documented unique-rank input this is byte-identical.
    idisc = F.try_element_at(
        F.array(*[F.lit(int(d)).cast("long") for d in dm]),
        F.col("_ir").cast("int"),
    )
    per = (
        staged.withColumn("_idg", F.col("_rel") * idisc)
        .groupBy("_g")
        .agg(
            F.sum("_dg").cast("long").alias("dcg_micro"),
            F.sum("_idg").cast("long").alias("idcg_micro"),
        )
    )
    ndcg = F.when(
        F.col("idcg_micro") > 0,
        F.round(F.col("dcg_micro") * F.lit(MICRO) / F.col("idcg_micro")).cast(
            "long"
        ),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        F.col("_g").alias(group_col),
        "dcg_micro",
        "idcg_micro",
        ndcg.alias("ndcg_micro"),
    ).withColumn(
        "mean_ndcg_micro",
        F.round(
            F.sum("ndcg_micro").over(wall) / F.count("ndcg_micro").over(wall)
        ).cast("long"),
    )


def ips_policy_value(
    logged: DataFrame,
    policy: DataFrame,
    segment_col: str = "segment",
    action_col: str = "action",
    reward_col: str = "reward",
) -> DataFrame:
    """Off-policy evaluation of a deterministic target policy from
    logged (segment, action, integer reward) data: inverse-propensity
    scoring (Horvitz-Thompson) plus the self-normalized variant
    (SNIPS, Swaminathan & Joachims 2015) and the effective sample
    size — the triple that says whether a proposed routing/curation
    policy can be judged from logs at all before an online test.

    Propensities are EMPIRICAL: p(a|x) = n(x,a)/n(x) from the logs
    themselves, so the inverse weight w = n(x)/n(x,a) is one division
    micro-rounded per (segment, action) CELL (dictionary-sized), never
    per row; matched-row contributions r·w_micro and the ESS sums are
    exact int64.  IPS/SNIPS/ESS are each ONE terminal division.  Two
    shuffles over the logs (cell counts, final fold); the policy join
    is broadcast-sized by construction.

    Output (single row): n_logged, n_matched, ips_value_micro,
    snips_value_micro (NULL when no rows match), ess_micro (effective
    sample size in micro units).
    """
    base = logged.select(
        F.col(segment_col).alias("_x"),
        F.col(action_col).alias("_a"),
        F.col(reward_col).cast("long").alias("_r"),
    )
    cells = base.groupBy("_x", "_a").agg(
        F.count("*").cast("long").alias("_nxa"),
        F.sum("_r").cast("long").alias("_rsum"),
    )
    wseg = Window.partitionBy("_x")
    cells = cells.withColumn(
        "_nx", F.sum("_nxa").over(wseg).cast("long")
    ).withColumn(
        "_w",
        F.round(F.col("_nx") * F.lit(MICRO) / F.col("_nxa")).cast("long"),
    )
    pol = policy.select(
        F.col(segment_col).alias("_x"),
        F.col(action_col).alias("_a"),
        F.lit(1).alias("_pi"),
    )
    marked = cells.join(F.broadcast(pol), ["_x", "_a"], "left")
    m = F.coalesce(F.col("_pi"), F.lit(0)).cast("long")
    agg = marked.agg(
        F.sum("_nxa").cast("long").alias("n_logged"),
        F.sum(m * F.col("_nxa")).cast("long").alias("n_matched"),
        F.sum(m * F.col("_rsum") * F.col("_w")).cast("long").alias("_swr"),
        F.sum(m * F.col("_nxa") * F.col("_w")).cast("long").alias("_sw"),
        F.sum(m * F.col("_nxa") * F.col("_w") * F.col("_w"))
        .cast("long")
        .alias("_sww"),
    )
    some = F.col("n_matched") > 0
    return agg.select(
        "n_logged",
        "n_matched",
        F.round(F.col("_swr") / F.col("n_logged")).cast("long").alias(
            "ips_value_micro"
        ),
        F.when(
            some,
            F.round(
                F.col("_swr").cast("double") * F.lit(MICRO) / F.col("_sw")
            ).cast("long"),
        ).alias("snips_value_micro"),
        F.when(
            some,
            F.round(
                F.col("_sw").cast("double")
                * F.col("_sw")
                * F.lit(MICRO)
                / F.col("_sww")
            ).cast("long"),
        ).alias("ess_micro"),
    )


def log_bleu(
    pairs: DataFrame,
    pair_id_col: str = "pair_id",
    ref_col: str = "ref_text",
    hyp_col: str = "hyp_text",
) -> DataFrame:
    """Corpus-scale sentence log-BLEU (unigram+bigram, uniform weights,
    add-one smoothing) between paired texts — the n-gram-overlap
    generation/near-copy score (Papineni et al. 2002) as one
    distributed job: tokenize → ONE exploded token stream per side →
    gram histograms → clipped-precision join per pair.

    log BLEU = min(0, 1 − r/c) + ½·ln p₁ + ½·ln p₂ with
    pₙ = (clipₙ+1)/(totₙ+1); reporting in LOG space keeps the whole
    number a sum of three independently micro-rounded terms (exp is
    never evaluated, so no cross-engine transcendental beyond ln —
    the proven qa66/qa81 ln-of-one-division idiom).  Clipped counts
    are Σ least(c_hyp, c_ref) over an inner gram join (absent grams
    clip to 0 for free); every count is int64.

    Grams come from lead() over the exploded token stream, not a
    transform()-built array — Spark 4.1 fuses array-building
    projections into the Generate they feed and re-evaluates per
    OUTPUT row (see operators/dedup.py:_dup_gram_occ).  The token
    shuffle is keyed by (pair, side) and reused by the bigram window.

    Output per pair: pair_id, ref_len, hyp_len, clip1, clip2,
    bp_micro, logp1_micro, logp2_micro, log_bleu_micro.  Pairs with an
    empty hypothesis or reference are dropped (BLEU undefined).
    """
    from .dedup import normalized_text_col

    melted = pairs.select(
        F.col(pair_id_col).alias("_pid"),
        F.lit(0).alias("_side"),
        F.split(normalized_text_col(F.col(ref_col)), " ").alias("_toks"),
    ).unionByName(
        pairs.select(
            F.col(pair_id_col).alias("_pid"),
            F.lit(1).alias("_side"),
            F.split(normalized_text_col(F.col(hyp_col)), " ").alias("_toks"),
        )
    )
    tok = melted.select(
        "_pid", "_side", F.posexplode("_toks").alias("_idx", "_w")
    ).where(F.length("_w") > 0)
    wseq = Window.partitionBy("_pid", "_side").orderBy("_idx")
    grams = tok.select(
        "_pid",
        "_side",
        F.col("_w").alias("_g1"),
        F.concat_ws(" ", "_w", F.lead("_w", 1).over(wseq)).alias("_g2c"),
        F.lead("_w", 1).over(wseq).isNotNull().alias("_has2"),
    )

    def side_counts(n: int) -> DataFrame:
        g = F.col("_g1") if n == 1 else F.col("_g2c")
        base = grams if n == 1 else grams.where(F.col("_has2"))
        c = base.groupBy("_pid", "_side", g.alias("_g")).agg(
            F.count("*").cast("long").alias("_c")
        )
        ref = c.where(F.col("_side") == 0).select(
            "_pid", "_g", F.col("_c").alias("_cr")
        )
        hyp = c.where(F.col("_side") == 1).select(
            "_pid", "_g", F.col("_c").alias("_ch")
        )
        return (
            hyp.join(ref, ["_pid", "_g"])
            .groupBy("_pid")
            .agg(
                F.sum(F.least(F.col("_ch"), F.col("_cr")))
                .cast("long")
                .alias(f"clip{n}")
            )
        )

    lens = (
        tok.groupBy("_pid")
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("ref_len"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hyp_len"),
        )
        .where((F.col("ref_len") > 0) & (F.col("hyp_len") > 0))
    )
    j = (
        lens.join(side_counts(1), "_pid", "left")
        .join(side_counts(2), "_pid", "left")
        .select(
            "_pid",
            "ref_len",
            "hyp_len",
            F.coalesce("clip1", F.lit(0)).cast("long").alias("clip1"),
            F.coalesce("clip2", F.lit(0)).cast("long").alias("clip2"),
        )
    )
    tot2 = F.greatest(F.col("hyp_len") - 1, F.lit(0))
    bp = F.round(
        F.lit(MICRO)
        * F.least(
            F.lit(0.0),
            F.lit(1.0)
            - F.col("ref_len").cast("double") / F.col("hyp_len"),
        )
    ).cast("long")
    lp1 = F.round(
        F.lit(MICRO / 2)
        * F.log(
            (F.col("clip1") + 1).cast("double") / (F.col("hyp_len") + 1)
        )
    ).cast("long")
    lp2 = F.round(
        F.lit(MICRO / 2)
        * F.log((F.col("clip2") + 1).cast("double") / (tot2 + 1))
    ).cast("long")
    return j.select(
        F.col("_pid").alias(pair_id_col),
        "ref_len",
        "hyp_len",
        "clip1",
        "clip2",
        bp.alias("bp_micro"),
        lp1.alias("logp1_micro"),
        lp2.alias("logp2_micro"),
        (bp + lp1 + lp2).cast("long").alias("log_bleu_micro"),
    )


def krippendorff_alpha_nominal(
    ratings: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha (nominal) from an (item, rater, label) long
    table — the inter-rater agreement coefficient that, unlike Fleiss
    kappa (qa61), tolerates missing ratings and any number of raters
    per item (Krippendorff 2004).

    Exactness: the observed-disagreement contribution of item u is
    Σ_c r_uc·(m_u − r_uc)/(m_u − 1) — integer except for ONE division
    by (m_u − 1), so it micro-rounds per ITEM and integer-sums; with a
    constant rater count the rounding is even exact.  Expected
    disagreement Σ_c n_c·(n − n_c) is pure int64; alpha is a terminal
    single-division of the two micro quantities.  Items with fewer
    than 2 ratings drop out (no pairable values), per the definition.
    Shuffles: (item, label) counts, per-item fold, label margins —
    all map-side combinable.

    Output (single row): n_items, n_ratings, do_micro, de_micro,
    alpha_micro (NULL when expected disagreement is 0).
    """
    base = ratings.select(
        F.col(item_col).alias("_u"),
        F.col(rater_col).alias("_r"),
        F.col(label_col).alias("_c"),
    )
    per_cell = base.groupBy("_u", "_c").agg(
        F.count("*").cast("long").alias("_ruc")
    )
    wu = Window.partitionBy("_u")
    per_cell = per_cell.withColumn(
        "_mu", F.sum("_ruc").over(wu).cast("long")
    ).where(F.col("_mu") >= 2)
    per_item = per_cell.groupBy("_u").agg(
        F.max("_mu").alias("_mu"),
        F.sum(F.col("_ruc") * (F.col("_mu") - F.col("_ruc")))
        .cast("long")
        .alias("_dis"),
    )
    item_do = per_item.select(
        "_mu",
        F.round(F.col("_dis") * F.lit(MICRO) / (F.col("_mu") - 1))
        .cast("long")
        .alias("_dou"),
    )
    margins = per_cell.groupBy("_c").agg(
        F.sum("_ruc").cast("long").alias("_nc")
    )
    tot = per_cell.agg(F.sum("_ruc").cast("long").alias("_n"))
    de = (
        margins.crossJoin(F.broadcast(tot))
        .agg(
            F.max("_n").alias("_n"),
            F.sum(F.col("_nc") * (F.col("_n") - F.col("_nc")))
            .cast("long")
            .alias("_de_num"),
        )
    )
    dos = item_do.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("_mu").cast("long").alias("n_ratings"),
        F.sum("_dou").cast("long").alias("_do_sum"),
    )
    j = dos.crossJoin(F.broadcast(de))
    do_micro = F.round(F.col("_do_sum") / F.col("n_ratings")).cast("long")
    de_micro = F.round(
        F.col("_de_num").cast("double")
        * F.lit(MICRO)
        / (F.col("_n") * (F.col("_n") - 1))
    ).cast("long")
    staged = j.select(
        "n_items",
        "n_ratings",
        do_micro.alias("do_micro"),
        de_micro.alias("de_micro"),
    )
    return staged.select(
        "n_items",
        "n_ratings",
        "do_micro",
        "de_micro",
        F.when(
            F.col("de_micro") > 0,
            F.round(
                (F.col("de_micro") - F.col("do_micro"))
                * F.lit(MICRO)
                / F.col("de_micro")
            ).cast("long"),
        ).alias("alpha_micro"),
    )


def rbo_weights_micro(k: int, p_num: int = 9, p_den: int = 10) -> list[int]:
    """Integer micro weight table for truncated rank-biased overlap:
    w[d-1] = round(1e6·(1−p)·p^(d−1)/d), p = p_num/p_den.  Computed
    once in Python from exact rationals and injected into BOTH engines
    (same construction as ndcg_discounts_micro)."""
    from fractions import Fraction

    p = Fraction(p_num, p_den)
    return [
        round(MICRO * (1 - p) * p ** (d - 1) / d) for d in range(1, k + 1)
    ]


def rbo_truncated(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    group_col: str,
    id_col: str,
    rank_col: str = "rank",
    k: int = 10,
    p_num: int = 9,
    p_den: int = 10,
) -> DataFrame:
    """Truncated rank-biased overlap RBO@k (Webber, Moffat & Zobel
    2010) between two per-group rankings — the top-weighted ranking
    similarity that, unlike Spearman (qa60), is defined on indefinite
    rankings and pays geometrically more attention to the head; the
    standard way to compare an ANN ranking against brute force, or
    yesterday's feed against today's.

    RBO@k = Σ_{d=1..k} (1−p)·p^(d−1)·|A_d ∩ B_d|/d.  The prefix-
    intersection sizes come from ONE equi-join: an item in both lists
    enters every prefix d ≥ max(rank_a, rank_b), so overlap_d is a
    cumulative count over m = greatest(ra, rb) — no per-depth set
    intersection.  Per-depth weights (including the /d) are
    Python-precomputed integer micros (rbo_weights_micro), so each
    depth term is an int64 PRODUCT and RBO is an exact integer sum —
    no engine division at all.

    Output per group: n_common_at_k (matched within both top-k),
    rbo_micro.  Groups present in either ranking report (missing
    matches = 0 overlap).
    """
    w_micro = rbo_weights_micro(k, p_num, p_den)
    a = ranked_a.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).cast("long").alias("_ra"),
    ).where(F.col("_ra") <= k)
    b = ranked_b.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).cast("long").alias("_rb"),
    ).where(F.col("_rb") <= k)
    groups = a.select("_g").unionByName(b.select("_g")).distinct()
    matched = a.join(b, ["_g", "_id"]).select(
        "_g", F.greatest(F.col("_ra"), F.col("_rb")).alias("_m")
    )
    # weight an item by the SUM of weights of depths it participates in:
    # Σ_{d>=m} w_d, precomputed as a suffix-sum lookup — one expression,
    # no depth join at all.
    suffix = [0] * (k + 2)
    for d in range(k, 0, -1):
        suffix[d] = suffix[d + 1] + w_micro[d - 1]
    wexpr = F.element_at(
        F.array(*[F.lit(int(suffix[d])).cast("long") for d in range(1, k + 1)]),
        F.col("_m").cast("int"),
    )
    per = matched.groupBy("_g").agg(
        F.count("*").cast("long").alias("n_common_at_k"),
        F.sum(wexpr).cast("long").alias("rbo_micro"),
    )
    return (
        groups.join(per, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            F.coalesce("n_common_at_k", F.lit(0)).cast("long").alias(
                "n_common_at_k"
            ),
            F.coalesce("rbo_micro", F.lit(0)).cast("long").alias("rbo_micro"),
        )
    )


def decile_lift(
    df: DataFrame,
    score_col,
    label_col,
    id_col: str,
    n_tiles: int = 10,
) -> DataFrame:
    """Decile lift / cumulative-gains table for a ranking score against
    a boolean outcome — the model-quality view a curation gate actually
    uses ("the top 10% of the score captures 31% of the positives,
    lift 3.1"), complementing roc_auc's single number.

    Tile semantics are EXACTLY ntile() over a TOTAL order (score desc,
    id asc — without the unique tiebreak, rows tied on score would land
    in engine-dependent tiles), but the implementation never ranks the
    row-level table: ntile is rank arithmetic, so a row at global rank
    r (N total, q = N div T, rem = N mod T) sits in tile
    (r-1) div (q+1) + 1 while r <= rem*(q+1), else
    rem + (r - rem*(q+1) - 1) div q + 1.  Global ranks come from the
    score HISTOGRAM's cumulative counts (the qa22/qa65 doubled-midrank
    pattern): a score group spanning ranks [c+1, c+n_s] that starts and
    ends in the same tile contributes its whole (count, positives) pair
    straight from the histogram; only the <= T-1 BOUNDARY score values
    need per-row id ranks, recovered with a window partitioned by that
    one score value (never an unpartitioned row-level window — the
    former global ntile ran as a single task at scale).  Counts are
    int64; capture and lift are each ONE micro-rounded division of
    integer products.

    Output per tile (1 = best): tile, n, n_pos, cum_n, cum_pos,
    capture_micro (cum_pos/total_pos), lift_micro
    ((cum_pos/cum_n)/(total_pos/total_n)).
    """
    base = df.select(
        (score_col if not isinstance(score_col, str) else F.col(score_col))
        .cast("long")
        .alias("_s"),
        (label_col if not isinstance(label_col, str) else F.col(label_col))
        .cast("boolean")
        .cast("long")
        .alias("_y"),
        F.col(id_col).alias("_tid"),
    )
    hist = base.groupBy("_s").agg(
        F.count("*").cast("long").alias("_ns"),
        F.sum("_y").cast("long").alias("_ps"),
    )
    # windows over the score histogram: bounded by the distinct-score
    # count, not the row count (documented allowlist case in
    # tools/dump_plans.py)
    wh = Window.orderBy(F.col("_s").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    whall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "_s",
        "_ns",
        "_ps",
        F.coalesce(F.sum("_ns").over(wh), F.lit(0)).cast("long").alias("_c"),
        F.sum("_ns").over(whall).cast("long").alias("_N"),
    ).withColumns(
        {
            "_q": F.expr(f"_N div {int(n_tiles)}"),
            "_rem": F.expr(f"_N % {int(n_tiles)}"),
        }
    )

    def _tile(r: str):
        # greatest(_q,1): the ELSE branch is unreachable when _q = 0
        # (then every rank satisfies r <= _rem*(_q+1) = N), but ANSI
        # mode evaluates eagerly enough that a literal div-by-zero in
        # dead code must still be guarded.
        return F.expr(
            f"CASE WHEN _rem = 0 THEN ({r} - 1) div _q + 1"
            f" WHEN {r} <= _rem * (_q + 1)"
            f" THEN ({r} - 1) div (_q + 1) + 1"
            f" ELSE _rem + ({r} - _rem * (_q + 1) - 1) div greatest(_q, 1)"
            f" + 1 END"
        )

    h = h.withColumns(
        {"_t0": _tile("_c + 1"), "_t1": _tile("_c + _ns")}
    )
    whole = h.where(F.col("_t0") == F.col("_t1")).select(
        F.col("_t0").cast("int").alias("tile"),
        F.col("_ns").alias("_n"),
        F.col("_ps").alias("_p"),
    )
    split = h.where(F.col("_t0") != F.col("_t1")).select(
        "_s", "_c", "_q", "_rem"
    )
    wb = Window.partitionBy("_s").orderBy("_tid")
    boundary = (
        base.join(F.broadcast(split), "_s")
        .withColumn(
            "_r", F.col("_c") + F.row_number().over(wb).cast("long")
        )
        .withColumn("tile", _tile("_r").cast("int"))
        .groupBy("tile")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum("_y").cast("long").alias("_p"),
        )
    )
    per = (
        whole.unionByName(boundary)
        .groupBy("tile")
        .agg(
            F.sum("_n").cast("long").alias("n"),
            F.sum("_p").cast("long").alias("n_pos"),
        )
    )
    wc = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per.select(
        "tile",
        "n",
        "n_pos",
        F.sum("n").over(wc).cast("long").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        F.sum("n").over(wall).cast("long").alias("_tn"),
        F.sum("n_pos").over(wall).cast("long").alias("_tp"),
    )
    return staged.select(
        "tile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        F.when(
            F.col("_tp") > 0,
            F.round(F.col("cum_pos") * F.lit(1_000_000) / F.col("_tp")).cast(
                "long"
            ),
        ).alias("capture_micro"),
        F.when(
            F.col("_tp") > 0,
            F.round(
                F.col("cum_pos")
                * F.col("_tn")
                * F.lit(1_000_000)
                / (F.col("cum_n") * F.col("_tp"))
            ).cast("long"),
        ).alias("lift_micro"),
    )


def mcnemar_test(
    paired: DataFrame,
    correct_a_col,
    correct_b_col,
) -> DataFrame:
    """McNemar's paired test for two classifiers evaluated on the SAME
    items — the right comparison when predictions are paired (marginal
    accuracies alone say nothing about whether A beats B on the items
    they disagree on).  Input: one row per item with boolean
    correctness columns for each classifier.

    chi2 (without continuity correction) = (b - c)^2 / (b + c) over the
    discordant counts b (A right, B wrong) and c (B right, A wrong) —
    exact int64 counts, ONE micro-rounded division; NULL when no
    discordant pairs.  Cost: one map-side-combined scalar aggregate
    (100 TB = one pass, no shuffle wider than the combine).

    Output (single row): n_pairs, n_both_correct, n_only_a, n_only_b,
    n_both_wrong, chi2_micro.
    """
    ca = (
        correct_a_col
        if not isinstance(correct_a_col, str)
        else F.col(correct_a_col)
    ).cast("boolean")
    cb = (
        correct_b_col
        if not isinstance(correct_b_col, str)
        else F.col(correct_b_col)
    ).cast("boolean")
    agg = paired.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((ca & cb).cast("long")).cast("long").alias("n_both_correct"),
        F.sum((ca & ~cb).cast("long")).cast("long").alias("n_only_a"),
        F.sum((~ca & cb).cast("long")).cast("long").alias("n_only_b"),
        F.sum((~ca & ~cb).cast("long")).cast("long").alias("n_both_wrong"),
    )
    b, c = F.col("n_only_a"), F.col("n_only_b")
    return agg.select(
        "n_pairs",
        "n_both_correct",
        "n_only_a",
        "n_only_b",
        "n_both_wrong",
        F.when(
            b + c > 0,
            F.round((b - c) * (b - c) * F.lit(MICRO) / (b + c)).cast("long"),
        ).alias("chi2_micro"),
    )


def mcc_binary(
    scored: DataFrame,
    pred_col,
    label_col,
) -> DataFrame:
    """Matthews correlation coefficient for a binary classifier — the
    single-number confusion summary that stays honest under class
    imbalance (accuracy and F1 both saturate when one class dominates,
    the standard failure of quality-gate metrics on skewed corpora).

    The four confusion counts are exact int64; the numerator
    TP*TN - FP*FN stays int64 (counts bound the products at n^2/4);
    the denominator's four marginals would overflow int64 when
    multiplied, so each is cast to double FIRST and the expression is
    evaluated in one fixed order: sqrt(((TP+FP)*(TP+FN))*((TN+FP)*
    (TN+FN))) — every step correctly-rounded IEEE, identical in any
    engine (the qb13 discipline).  NULL when any marginal is 0.

    Output (single row): tp, fp, fn, tn, mcc_micro.
    """
    p = (
        pred_col if not isinstance(pred_col, str) else F.col(pred_col)
    ).cast("boolean")
    y = (
        label_col if not isinstance(label_col, str) else F.col(label_col)
    ).cast("boolean")
    agg = scored.agg(
        F.sum((p & y).cast("long")).cast("long").alias("tp"),
        F.sum((p & ~y).cast("long")).cast("long").alias("fp"),
        F.sum((~p & y).cast("long")).cast("long").alias("fn"),
        F.sum((~p & ~y).cast("long")).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    num = (tp * tn - fp * fn).cast("double")
    den = F.sqrt(
        ((tp + fp).cast("double") * (tp + fn).cast("double"))
        * ((tn + fp).cast("double") * (tn + fn).cast("double"))
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            F.round(num * F.lit(MICRO) / den).cast("long"),
        ).alias("mcc_micro"),
    )


def conformal_split_coverage(
    df: DataFrame,
    score_col,
    id_col: str,
    alpha_micro: int = 100_000,
    cal_fraction_micro: int = 500_000,
    salt: str = "conformal",
) -> DataFrame:
    """Split-conformal calibration + held-out coverage audit over an
    integer nonconformity score: calibrate the (1-alpha) quantile
    q_hat = the ceil((n_cal+1)(1-alpha))-th smallest calibration score,
    then measure what fraction of the held-out split falls at or below
    it — the distribution-free "does my uncertainty gate actually
    cover 90%?" check.

    Deterministic split: md5(salt + id) 40-bit integer vs the
    cal_fraction threshold (the q62 split idiom — resumable, engine-
    portable, no RNG).  The order statistic is NEVER a global sort:
    q_hat = the smallest distinct score whose cumulative calibration
    count reaches rank k, read off the score HISTOGRAM (window over
    distinct scores — the qa22/qb04 bounded-window idiom).

    Output (single row): n_cal, n_test, rank_k, q_hat, n_covered,
    coverage_micro (covered/n_test; NULL if the test split is empty).
    """
    s = (
        score_col if not isinstance(score_col, str) else F.col(score_col)
    ).cast("long")
    h40 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 10),
        16,
        10,
    ).cast("long")
    thr = (int(cal_fraction_micro) << 40) // MICRO
    base = df.select(
        s.alias("_s"), (h40 < F.lit(thr)).alias("_is_cal")
    )
    hist = base.groupBy("_s").agg(
        F.sum(F.col("_is_cal").cast("long")).cast("long").alias("_nc"),
        F.sum((~F.col("_is_cal")).cast("long")).cast("long").alias("_nt"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = hist.select(
        "_s",
        "_nt",
        F.sum("_nc").over(wcum).cast("long").alias("_cum_cal"),
        F.sum("_nc").over(wall).cast("long").alias("n_cal"),
        F.sum("_nt").over(wall).cast("long").alias("n_test"),
    )
    # rank k = ceil((n_cal+1)*(1-alpha)), clamped to n_cal
    k = F.least(
        F.expr(
            f"((n_cal + 1) * CAST({MICRO - int(alpha_micro)} AS BIGINT)"
            f" + {MICRO - 1}) div {MICRO}"
        ),
        F.col("n_cal"),
    )
    covered = staged.withColumn("_k", k).where(F.col("_cum_cal") >= F.col("_k"))
    qrow = covered.orderBy("_s").limit(1)
    # coverage counts test scores <= q_hat: cumulative test count up to
    # q_hat = (total test) - (test strictly above q_hat); derive from
    # the same histogram row set
    above = covered.agg(F.sum("_nt").cast("long").alias("_above"))
    return (
        qrow.crossJoin(F.broadcast(above))
        .select(
            "n_cal",
            "n_test",
            F.col("_k").cast("long").alias("rank_k"),
            F.col("_s").alias("q_hat"),
            (F.col("n_test") - F.col("_above") + F.col("_nt"))
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "n_cal",
            "n_test",
            "rank_k",
            "q_hat",
            "n_covered",
            F.when(
                F.col("n_test") > 0,
                F.round(F.col("n_covered") * F.lit(MICRO) / F.col("n_test"))
                .cast("long"),
            ).alias("coverage_micro"),
        )
    )


def fairness_audit(
    df: DataFrame,
    pred_flag,
    label_flag,
    group_col: str,
    di_threshold_micro: int = 800_000,
) -> DataFrame:
    """Group-fairness audit of a binary classifier: per protected
    group the selection rate, TPR and FPR, their gaps against the
    GLOBAL rates (demographic parity / equalized odds), and the
    four-fifths disparate-impact ratio with its flag — the model-card
    table next to qb19's MCC and qa86's macro-F1.

    One integer contingency per group (tp/fp/fn/tn, map-side
    combinable), global rates from the summed contingency broadcast
    back (no window, no second scan).  Rates are micro-rounded single
    divisions; gaps are differences of those micro ints; the DI ratio
    is one division of two micro ints, and the flag compares the
    ROUNDED ratio to an integer threshold (qb54 discipline).  Rates
    with empty denominators are null and their gaps/flags null too.

    Output per group: (group, n, tp, fp, fn, tn, sel_rate_micro,
    tpr_micro, fpr_micro, dp_gap_micro, tpr_gap_micro, fpr_gap_micro,
    di_ratio_micro, di_flag).
    """
    p = pred_flag if not isinstance(pred_flag, str) else F.col(pred_flag)
    y = label_flag if not isinstance(label_flag, str) else F.col(label_flag)
    base = df.select(
        F.col(group_col).alias("_g"),
        F.when(p, F.lit(1)).otherwise(F.lit(0)).alias("_p"),
        F.when(y, F.lit(1)).otherwise(F.lit(0)).alias("_y"),
    )
    cont = base.groupBy("_g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("_p") * F.col("_y")).cast("long").alias("tp"),
        F.sum(F.col("_p") * (1 - F.col("_y"))).cast("long").alias("fp"),
        F.sum((1 - F.col("_p")) * F.col("_y")).cast("long").alias("fn"),
        F.sum((1 - F.col("_p")) * (1 - F.col("_y")))
        .cast("long")
        .alias("tn"),
    )
    tot = cont.agg(
        F.sum("n").cast("long").alias("_tn_all"),
        F.sum("tp").cast("long").alias("_ttp"),
        F.sum("fp").cast("long").alias("_tfp"),
        F.sum("fn").cast("long").alias("_tfn"),
        F.sum("tn").cast("long").alias("_ttn"),
    )

    def _rate(num, den):
        return F.when(
            den > 0, F.round(num * F.lit(1_000_000) / den).cast("long")
        )

    g_sel = _rate(F.col("tp") + F.col("fp"), F.col("n"))
    g_tpr = _rate(F.col("tp"), F.col("tp") + F.col("fn"))
    g_fpr = _rate(F.col("fp"), F.col("fp") + F.col("tn"))
    a_sel = _rate(F.col("_ttp") + F.col("_tfp"), F.col("_tn_all"))
    a_tpr = _rate(F.col("_ttp"), F.col("_ttp") + F.col("_tfn"))
    a_fpr = _rate(F.col("_tfp"), F.col("_tfp") + F.col("_ttn"))
    joined = cont.crossJoin(F.broadcast(tot))
    di = F.when(
        g_sel.isNotNull() & a_sel.isNotNull() & (a_sel > 0),
        F.round(g_sel * F.lit(1_000_000) / a_sel).cast("long"),
    )
    return joined.select(
        F.col("_g").alias(group_col),
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        g_sel.alias("sel_rate_micro"),
        g_tpr.alias("tpr_micro"),
        g_fpr.alias("fpr_micro"),
        (g_sel - a_sel).cast("long").alias("dp_gap_micro"),
        (g_tpr - a_tpr).cast("long").alias("tpr_gap_micro"),
        (g_fpr - a_fpr).cast("long").alias("fpr_gap_micro"),
        di.alias("di_ratio_micro"),
        F.when(di.isNotNull(), (di < int(di_threshold_micro)).cast("long"))
        .cast("long")
        .alias("di_flag"),
    )


def average_precision_at_k(
    scored: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Average Precision@k per query over binary relevance — the
    PR-side ranking metric next to qa65's ROC-AUC (which is
    prevalence-blind) and qa89's NDCG (graded): AP rewards putting
    relevant items EARLY, exactly what retrieval-for-RAG tuning
    optimizes.

    Exactness by construction: with ranks from a total order
    (score desc, id), each hit contributes precision@i = cumrel_i/i;
    multiplying through by L = lcm(1..k) makes every term
    cumrel_i * (L/i) an exact int64, so AP = sum / (L * min(R, k))
    is ONE terminal micro-rounded division — no per-term rounding,
    no double accumulation.  Windows are partitioned by query (never
    global — the qb04 lesson).

    Output per query: (query, n_rel, n_rel_at_k, ap_micro); null AP
    when the query has no relevant candidates.
    """
    import math

    kk = int(k)
    L = math.lcm(*range(1, kk + 1))
    wq = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_id").asc()
    )
    base = scored.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_s"),
        F.col(rel_col).cast("long").alias("_r"),
    )
    ranked = base.select(
        "_q",
        "_r",
        F.row_number().over(wq).alias("_rank"),
        F.sum("_r").over(wq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cum"),
    )
    # integer weight L/i per rank i (exact by choice of L); guarded by
    # the rank<=k branch but try_element_at anyway (ANSI, qa89 lesson)
    wmap = F.try_element_at(
        F.lit([L // i for i in range(1, kk + 1)]), F.col("_rank").cast("int")
    )
    agg = ranked.groupBy("_q").agg(
        F.sum("_r").cast("long").alias("n_rel"),
        F.sum(F.when((F.col("_rank") <= kk) & (F.col("_r") == 1), 1)
              .otherwise(0)).cast("long").alias("n_rel_at_k"),
        F.sum(
            F.when(
                (F.col("_rank") <= kk) & (F.col("_r") == 1),
                F.col("_cum") * wmap,
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_num"),
    )
    den = F.least(F.col("n_rel"), F.lit(kk)) * F.lit(L)
    return agg.select(
        F.col("_q").alias(query_col),
        "n_rel",
        "n_rel_at_k",
        F.when(
            F.col("n_rel") > 0,
            F.round(F.col("_num") * F.lit(1_000_000) / den).cast("long"),
        ).alias("ap_micro"),
    )


def err_at_k(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 5,
    gmax: int = 2,
) -> DataFrame:
    """Expected Reciprocal Rank@k with dyadic stop probabilities — the
    cascade-model ranking metric next to qa89's NDCG (positional
    discount, no user model) and qb75's AP (binary): ERR models a user
    who stops at the first satisfying result, so one perfect hit at
    rank 1 dominates — the metric RAG rerankers actually optimize.

    Exactness by construction: grade g maps to stop probability
    R = (2^g - 1) / 2^gmax, a dyadic rational, so every cascade term
    (1/r) * R_r * prod_{i<r}(1 - R_i) becomes an exact int64 after
    multiplying through by L * (2^gmax)^k with L = lcm(1..k):
    term_r = (L/r) * num_r * prod_{i<r}(base - num_i) * base^(k-r).
    The pivot to per-rank grade columns is one conditional agg per
    query (k columns, never a window over the corpus); ERR is ONE
    terminal micro-rounded division by the constant L * base^k.

    Input: rows already ranked+filtered to rank <= k with a TOTAL
    order (qa89 pipeline shape).  Output per query:
    (query, err_num exact-integer numerator, err_micro,
    mean_err_micro) — err_num makes the hash a pure-integer compare.
    """
    import math

    kk, base = int(k), 1 << int(gmax)
    L = math.lcm(*range(1, kk + 1))
    grade_cols = [
        F.coalesce(
            F.max(
                F.when(F.col(rank_col) == r, F.col(rel_col).cast("long"))
            ),
            F.lit(0),
        ).alias(f"_g{r}")
        for r in range(1, kk + 1)
    ]
    g = ranked.groupBy(F.col(query_col).alias("_q")).agg(*grade_cols)

    def num(r: int):
        c = F.col(f"_g{r}")
        expr = F.lit(0)
        for gr in range(1, int(gmax) + 1):
            expr = F.when(c == gr, F.lit((1 << gr) - 1)).otherwise(expr)
        return expr.cast("long")

    cont = F.lit(1).cast("long")
    terms = []
    for r in range(1, kk + 1):
        terms.append(
            F.lit(L // r).cast("long")
            * num(r)
            * cont
            * F.lit(base ** (kk - r)).cast("long")
        )
        cont = cont * (F.lit(base).cast("long") - num(r))
    err_num = terms[0]
    for t in terms[1:]:
        err_num = err_num + t
    denom = L * base**kk
    per = g.select(
        F.col("_q").alias(query_col),
        err_num.cast("long").alias("err_num"),
    ).select(
        query_col,
        "err_num",
        F.round(F.col("err_num") * F.lit(MICRO) / F.lit(denom))
        .cast("long")
        .alias("err_micro"),
    )
    w = Window.partitionBy()
    return per.select(
        query_col,
        "err_num",
        "err_micro",
        F.round(F.sum("err_micro").over(w) / F.count("*").over(w))
        .cast("long")
        .alias("mean_err_micro"),
    )


def mrr_at_k(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    rel_threshold: int = 2,
) -> DataFrame:
    """Mean Reciprocal Rank@k over a graded ranking — the
    first-relevant-position metric completing the suite (qa89 NDCG /
    qb75 AP / err_at_k): the navigational "how deep until the answer"
    number ops dashboards track per retriever build.

    Exact integers: rr_num = L / first_rank with L = lcm(1..k) is an
    exact int64 (0 when no relevant result in the top k); MRR is one
    terminal division by (n_queries * L) micro-rounded.  first_rank
    is nullable BIGINT (promotes to float64 identically in both
    engines — q22 precedent).
    """
    import math

    kk = int(k)
    L = math.lcm(*range(1, kk + 1))
    per = (
        ranked.groupBy(F.col(query_col).alias("_q"))
        .agg(
            F.min(
                F.when(
                    (F.col(rank_col) <= kk)
                    & (F.col(rel_col) >= rel_threshold),
                    F.col(rank_col).cast("long"),
                )
            ).alias("first_rank")
        )
        .select(
            F.col("_q").alias(query_col),
            "first_rank",
            F.coalesce(
                F.try_element_at(
                    F.lit([L // i for i in range(1, kk + 1)]),
                    F.col("first_rank").cast("int"),
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rr_num"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        query_col,
        "first_rank",
        "rr_num",
        F.round(
            F.sum("rr_num").over(w) * F.lit(MICRO)
            / (F.count("*").over(w) * F.lit(L))
        )
        .cast("long")
        .alias("mrr_micro"),
    )


def qini_curve(
    df: DataFrame,
    score_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Qini (uplift gains) curve over a targeting score with a
    treatment/control split — "if we contact the top-scored units,
    how many INCREMENTAL conversions do we get vs not contacting
    them", the causal sibling of decile_lift's correlational gains
    (qb04).  One row per distinct score (descending, best first):

        uplift_milli = 1000·cumY_t − round(1000·cumY_c·cumN_t/cumN_c)

    i.e. treated conversions so far minus the control conversions
    scaled to the treated audience size — the classical Qini y-axis
    in exact milli-counts (ONE per-point division; 0 control so far
    contributes no subtraction).  The doubled trapezoid area
    auqc2_milli = Σ Δx·(y+y_prev) with x = cumN_t is an INTEGER sum;
    rand2_milli = N_t·uplift_total is the doubled area under the
    random-targeting diagonal; qini2_milli = auqc2 − rand2 > 0 means
    the score targets better than random.  The only windows run over
    the distinct-score spine (histogram-sized, qa22 family) —
    coarsen scores (e.g. cents buckets) at web scale.

    Output per point: (score, cum_n_t, cum_n_c, cum_y_t, cum_y_c,
    uplift_milli) plus broadcast-attached (auqc2_milli, rand2_milli,
    qini2_milli).
    """
    base = df.select(
        F.col(score_col).cast("long").alias("_s"),
        F.col(treat_col).cast("boolean").cast("long").alias("_tr"),
        F.col(outcome_col).cast("boolean").cast("long").alias("_y"),
    )
    hist = base.groupBy("_s").agg(
        F.sum("_tr").cast("long").alias("_nt"),
        F.sum(1 - F.col("_tr")).cast("long").alias("_nc"),
        F.sum(F.col("_tr") * F.col("_y")).cast("long").alias("_yt"),
        F.sum((1 - F.col("_tr")) * F.col("_y")).cast("long").alias("_yc"),
    )
    w = Window.orderBy(F.col("_s").desc())
    cum = hist.select(
        "_s",
        F.sum("_nt").over(w).cast("long").alias("cum_n_t"),
        F.sum("_nc").over(w).cast("long").alias("cum_n_c"),
        F.sum("_yt").over(w).cast("long").alias("cum_y_t"),
        F.sum("_yc").over(w).cast("long").alias("cum_y_c"),
    )
    uplift = F.when(
        F.col("cum_n_c") > 0,
        (
            F.lit(1000) * F.col("cum_y_t")
            - F.round(
                (F.lit(1000) * F.col("cum_y_c") * F.col("cum_n_t")).cast(
                    "double"
                )
                / F.col("cum_n_c")
            )
        ).cast("long"),
    ).otherwise((F.lit(1000) * F.col("cum_y_t")).cast("long"))
    pts = cum.withColumn("uplift_milli", uplift)
    tz = pts.select(
        "_s",
        (
            (F.col("cum_n_t") - F.coalesce(F.lag("cum_n_t").over(w), F.lit(0)))
            * (
                F.col("uplift_milli")
                + F.coalesce(F.lag("uplift_milli").over(w), F.lit(0))
            )
        )
        .cast("long")
        .alias("_tz2"),
    )
    a2 = tz.groupBy().agg(F.sum("_tz2").cast("long").alias("auqc2_milli"))
    tot = base.groupBy().agg(
        F.sum("_tr").cast("long").alias("_NT"),
        F.sum(1 - F.col("_tr")).cast("long").alias("_NC"),
        F.sum(F.col("_tr") * F.col("_y")).cast("long").alias("_YT"),
        F.sum((1 - F.col("_tr")) * F.col("_y")).cast("long").alias("_YC"),
    )
    rand = tot.select(
        (
            F.col("_NT")
            * F.when(
                F.col("_NC") > 0,
                (
                    F.lit(1000) * F.col("_YT")
                    - F.round(
                        (F.lit(1000) * F.col("_YC") * F.col("_NT")).cast(
                            "double"
                        )
                        / F.col("_NC")
                    )
                ).cast("long"),
            ).otherwise((F.lit(1000) * F.col("_YT")).cast("long"))
        )
        .cast("long")
        .alias("rand2_milli")
    )
    g = a2.crossJoin(rand).select(
        "auqc2_milli",
        "rand2_milli",
        (F.col("auqc2_milli") - F.col("rand2_milli"))
        .cast("long")
        .alias("qini2_milli"),
    )
    return pts.select(
        F.col("_s").alias(score_col),
        "cum_n_t",
        "cum_n_c",
        "cum_y_t",
        "cum_y_c",
        "uplift_milli",
    ).crossJoin(F.broadcast(g))


def brier_decomposition(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Brier score with the Murphy decomposition (reliability −
    resolution + uncertainty) over the same equi-width confidence
    bins as calibration_report — ECE (qa82) says HOW FAR the bars are
    from the diagonal; Murphy says how much of the error is
    miscalibration (REL, fixable by recalibrating) vs lack of
    discrimination (RES, needs a better model) vs irreducible base
    rate (UNC).

    Bin confidence is the exact midpoint micro (2b+1)·1e6/(2·n_bins);
    per-bin Brier numerators pos·(conf−1e6)² + (n−pos)·conf² and the
    REL/RES numerators n_b·(conf−acc)² / n_b·(acc−ō)² are int64
    (micro² × count — fine to ~10⁶ rows/bin·10⁶-micro², coarsen bins
    beyond); each reported number is ONE terminal micro-rounded
    division of integer sums.  acc and ō are micro-rounded once, so
    the decomposition identity holds to micro precision (documented).

    Output per bin: (bin, n, pos, conf_micro, acc_micro) plus
    broadcast-attached corpus (brier_micro, rel_micro, res_micro,
    unc_micro).
    """
    base = df.select(
        (
            score_col if not isinstance(score_col, str) else F.col(score_col)
        )
        .cast("long")
        .alias("_s"),
        (
            label_col if not isinstance(label_col, str) else F.col(label_col)
        )
        .cast("boolean")
        .cast("long")
        .alias("_y"),
    )
    ext = base.groupBy().agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    nb = int(n_bins)
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("_s") - F.col("_mn"))
            * nb
            / (F.col("_mx") - F.col("_mn") + 1)
        )
        .cast("long")
        .alias("bin"),
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_y").cast("long").alias("pos"),
    )
    conf = (2 * F.col("bin") + 1) * F.lit(MICRO) / F.lit(2 * nb)
    per = per.select(
        "bin",
        "n",
        "pos",
        conf.cast("long").alias("conf_micro"),
        F.round(F.col("pos") * F.lit(MICRO) / F.col("n"))
        .cast("long")
        .alias("acc_micro"),
    )
    tot = per.groupBy().agg(
        F.sum("n").cast("long").alias("_N"),
        F.sum("pos").cast("long").alias("_P"),
    )
    tot = tot.select(
        "_N",
        "_P",
        F.round(F.col("_P") * F.lit(MICRO) / F.col("_N"))
        .cast("long")
        .alias("_obar"),
    )
    terms = per.crossJoin(F.broadcast(tot)).select(
        "bin",
        (
            F.col("pos")
            * (F.col("conf_micro") - F.lit(MICRO))
            * (F.col("conf_micro") - F.lit(MICRO))
            + (F.col("n") - F.col("pos"))
            * F.col("conf_micro")
            * F.col("conf_micro")
        )
        .cast("long")
        .alias("_bn"),
        (
            F.col("n")
            * (F.col("conf_micro") - F.col("acc_micro"))
            * (F.col("conf_micro") - F.col("acc_micro"))
        )
        .cast("long")
        .alias("_reln"),
        (
            F.col("n")
            * (F.col("acc_micro") - F.col("_obar"))
            * (F.col("acc_micro") - F.col("_obar"))
        )
        .cast("long")
        .alias("_resn"),
    )
    sums = terms.groupBy().agg(
        F.sum("_bn").cast("long").alias("_sb"),
        F.sum("_reln").cast("long").alias("_srel"),
        F.sum("_resn").cast("long").alias("_sres"),
    )
    g = sums.crossJoin(tot).select(
        F.round(F.col("_sb") / (F.col("_N") * F.lit(MICRO)))
        .cast("long")
        .alias("brier_micro"),
        F.round(F.col("_srel") / (F.col("_N") * F.lit(MICRO)))
        .cast("long")
        .alias("rel_micro"),
        F.round(F.col("_sres") / (F.col("_N") * F.lit(MICRO)))
        .cast("long")
        .alias("res_micro"),
        F.round(
            F.col("_obar").cast("double")
            * (F.lit(MICRO) - F.col("_obar"))
            / F.lit(MICRO)
        )
        .cast("long")
        .alias("unc_micro"),
    )
    return per.crossJoin(F.broadcast(g))


def delong_auc_test(
    df: DataFrame,
    score_a_col,
    score_b_col,
    label_col,
    id_col: str,
) -> DataFrame:
    """DeLong's paired AUC comparison — "is ranker A's AUC actually
    better than B's ON THE SAME items, or is the gap noise": the
    placement-value z-test from DeLong et al. 1988, the standard tool
    for comparing two scores without a holdout rerun.

    Scale-correct placements with NO pairwise join: for each score,
    the distinct-value spine carries per-class cumulative counts, so
    a positive item's placement V10 = (#neg below + ½#neg tied)/m and
    a negative's V01 arrive as exact DOUBLED integers (2·cumlt + tie,
    the qa22 midrank idiom) via one equi-join of items to their
    score's spine.  All ten moments (Σp, Σp², Σp_a·p_b per class) are
    int64 sums; AUCs, the covariance-corrected variance
    var = (S10_aa + S10_bb − 2·S10_ab)/n + (S01_aa + S01_bb −
    2·S01_ab)/m and z are ONE fixed scalar DAG (products past int64
    range are cast double first — qb13 discipline).

    Output (single row): (n_pos, n_neg, auc_a_micro, auc_b_micro,
    delta_micro, z_milli).
    """

    def _c(c):
        return c if not isinstance(c, str) else F.col(c)

    base = df.select(
        F.col(id_col).alias("_id"),
        _c(score_a_col).cast("long").alias("_a"),
        _c(score_b_col).cast("long").alias("_b"),
        _c(label_col).cast("boolean").cast("long").alias("_y"),
    )

    def placements(val: str, out: str) -> DataFrame:
        hist = base.groupBy(F.col(val).alias("_v")).agg(
            F.sum("_y").cast("long").alias("_np"),
            F.sum(1 - F.col("_y")).cast("long").alias("_nn"),
        )
        w = Window.orderBy("_v")
        tp = hist.groupBy().agg(F.sum("_np").cast("long").alias("_tp"))
        spine = hist.crossJoin(F.broadcast(tp)).select(
            "_v",
            (F.sum("_np").over(w) - F.col("_np")).cast("long").alias("_ltp"),
            (F.sum("_nn").over(w) - F.col("_nn")).cast("long").alias("_ltn"),
            "_np",
            "_nn",
            "_tp",
        )
        return base.select("_id", "_y", F.col(val).alias("_v")).join(
            spine, "_v"
        ).select(
            "_id",
            F.when(
                F.col("_y") == 1,
                2 * F.col("_ltn") + F.col("_nn"),
            )
            .otherwise(
                2 * (F.col("_tp") - F.col("_ltp") - F.col("_np"))
                + F.col("_np")
            )
            .cast("long")
            .alias(out),
        )
    pa = placements("_a", "_pa2")
    pb = placements("_b", "_pb2")
    items = (
        base.select("_id", "_y").join(pa, "_id").join(pb, "_id")
    )
    mom = items.groupBy("_y").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_pa2").cast("long").alias("_sa"),
        F.sum("_pb2").cast("long").alias("_sb"),
        F.sum(F.col("_pa2") * F.col("_pa2")).cast("long").alias("_saa"),
        F.sum(F.col("_pb2") * F.col("_pb2")).cast("long").alias("_sbb"),
        F.sum(F.col("_pa2") * F.col("_pb2")).cast("long").alias("_sab"),
    )
    pos = mom.where(F.col("_y") == 1).select(
        F.col("_n").alias("n_pos"),
        F.col("_sa").alias("SA"),
        F.col("_sb").alias("SB"),
        F.col("_saa").alias("SAA"),
        F.col("_sbb").alias("SBB"),
        F.col("_sab").alias("SAB"),
    )
    neg = mom.where(F.col("_y") == 0).select(
        F.col("_n").alias("n_neg"),
        F.col("_sa").alias("TA"),
        F.col("_sb").alias("TB"),
        F.col("_saa").alias("TAA"),
        F.col("_sbb").alias("TBB"),
        F.col("_sab").alias("TAB"),
    )
    j = pos.crossJoin(neg)
    n, m = F.col("n_pos"), F.col("n_neg")
    auc_a = F.col("SA") / (F.lit(2.0) * n * m)
    auc_b = F.col("SB") / (F.lit(2.0) * n * m)
    c10aa = F.col("SAA") - F.col("SA").cast("double") * F.col("SA") / n
    c10bb = F.col("SBB") - F.col("SB").cast("double") * F.col("SB") / n
    c10ab = F.col("SAB") - F.col("SA").cast("double") * F.col("SB") / n
    c01aa = F.col("TAA") - F.col("TA").cast("double") * F.col("TA") / m
    c01bb = F.col("TBB") - F.col("TB").cast("double") * F.col("TB") / m
    c01ab = F.col("TAB") - F.col("TA").cast("double") * F.col("TB") / m
    s10 = (c10aa + c10bb - 2 * c10ab) / (
        F.lit(4.0) * m * m * (n - 1)
    )
    s01 = (c01aa + c01bb - 2 * c01ab) / (
        F.lit(4.0) * n * n * (m - 1)
    )
    var = s10 / n + s01 / m
    return j.select(
        "n_pos",
        "n_neg",
        F.round(auc_a * 1000000).cast("long").alias("auc_a_micro"),
        F.round(auc_b * 1000000).cast("long").alias("auc_b_micro"),
        F.round((auc_a - auc_b) * 1000000).cast("long").alias("delta_micro"),
        F.when(
            (n > 1) & (m > 1) & (var > 0),
            F.round((auc_a - auc_b) / F.sqrt(var) * 1000).cast("long"),
        ).alias("z_milli"),
    )


def hosmer_lemeshow(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit over the same equi-width
    confidence bins as calibration_report/brier_decomposition — the
    χ² TEST for "are the observed rates consistent with the implied
    confidences", where ECE (qa82) reports the gap size and Murphy
    (qc13) attributes it: HL gives the significance yardstick
    (χ² with n_bins − 2 df).

        HL = Σ_b (pos_b·1e6 − n_b·conf_b)² / (n_b·conf_b·(1e6−conf_b))

    in micro units: the numerator difference is an exact int64, its
    square is cast double FIRST (past int64 — qb13 discipline), the
    denominator n·conf·(1e6−conf) stays int64, and each bin's term is
    milli-rounded ONCE then integer-summed (never a raw double
    accumulation).  Degenerate bins (conf 0 or 1e6 — impossible for
    midpoint confidences — or n = 0) contribute nothing.

    Output per bin: (bin, n, pos, conf_micro, expected_pos,
    term_milli) plus broadcast-attached (hl_milli, df_hl).
    """
    base = df.select(
        (
            score_col if not isinstance(score_col, str) else F.col(score_col)
        )
        .cast("long")
        .alias("_s"),
        (
            label_col if not isinstance(label_col, str) else F.col(label_col)
        )
        .cast("boolean")
        .cast("long")
        .alias("_y"),
    )
    ext = base.groupBy().agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    nb = int(n_bins)
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("_s") - F.col("_mn"))
            * nb
            / (F.col("_mx") - F.col("_mn") + 1)
        )
        .cast("long")
        .alias("bin"),
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_y").cast("long").alias("pos"),
    )
    conf = ((2 * F.col("bin") + 1) * F.lit(MICRO) / F.lit(2 * nb)).cast(
        "long"
    )
    per = per.select("bin", "n", "pos", conf.alias("conf_micro"))
    diff = (
        F.col("pos") * F.lit(MICRO) - F.col("n") * F.col("conf_micro")
    ).cast("double")
    den = (
        F.col("n")
        * F.col("conf_micro")
        * (F.lit(MICRO) - F.col("conf_micro"))
    )
    terms = per.select(
        "bin",
        "n",
        "pos",
        "conf_micro",
        F.round(F.col("n") * F.col("conf_micro") / F.lit(MICRO))
        .cast("long")
        .alias("expected_pos"),
        F.when(
            den > 0,
            F.round(diff * diff / den * 1000).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("term_milli"),
    )
    g = terms.groupBy().agg(
        F.sum("term_milli").cast("long").alias("hl_milli"),
        (F.count("*") - 2).cast("long").alias("df_hl"),
    )
    return terms.crossJoin(F.broadcast(g))


def calibration_slope(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration-in-the-large and calibration slope via the linear
    probability fit of outcome on binned confidence — the two-number
    recalibration summary (intercept ≠ 0: systematic bias; slope < 1:
    overconfident, > 1: underconfident) completing ECE (qa82), Murphy
    (qc13) and Hosmer-Lemeshow (qc23) on the SAME equi-width bins.

    OLS on the bin-level (conf, acc) pairs weighted by bin counts is
    exact from six integer sums (conf is the exact midpoint micro,
    acc enters as the integer pos count so no pre-rounding):
    slope = (W·Σw·c·y − Σw·c·Σw·y)/(W·Σw·c² − (Σw·c)²) with w = n_b —
    products past int64 cast double first (qb13), one fixed DAG.

    Output (single row): (n, n_bins_used, slope_milli,
    intercept_micro, large_gap_micro = overall rate − mean conf).
    """
    base = df.select(
        (
            score_col if not isinstance(score_col, str) else F.col(score_col)
        )
        .cast("long")
        .alias("_s"),
        (
            label_col if not isinstance(label_col, str) else F.col(label_col)
        )
        .cast("boolean")
        .cast("long")
        .alias("_y"),
    )
    ext = base.groupBy().agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    nb = int(n_bins)
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("_s") - F.col("_mn"))
            * nb
            / (F.col("_mx") - F.col("_mn") + 1)
        )
        .cast("long")
        .alias("bin"),
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    conf = ((2 * F.col("bin") + 1) * F.lit(MICRO) / F.lit(2 * nb)).cast(
        "long"
    )
    per = per.select("_n", "_pos", conf.alias("_cf"))
    s = per.groupBy().agg(
        F.count("*").cast("long").alias("n_bins_used"),
        F.sum("_n").cast("long").alias("_W"),
        F.sum(F.col("_n") * F.col("_cf")).cast("long").alias("_swc"),
        F.sum("_pos").cast("long").alias("_swy"),
        F.sum(F.col("_n") * F.col("_cf") * F.col("_cf"))
        .cast("long")
        .alias("_swcc"),
        F.sum(F.col("_pos") * F.col("_cf")).cast("long").alias("_swcy"),
    )
    num = (
        F.col("_W").cast("double") * F.col("_swcy") * F.lit(MICRO)
        - F.col("_swc").cast("double") * F.col("_swy") * F.lit(MICRO)
    )
    den = (
        F.col("_W").cast("double") * F.col("_swcc")
        - F.col("_swc").cast("double") * F.col("_swc")
    )
    slope = num / den
    mean_y = F.col("_swy").cast("double") * F.lit(MICRO) / F.col("_W")
    mean_c = F.col("_swc").cast("double") / F.col("_W")
    return s.select(
        F.col("_W").alias("n"),
        "n_bins_used",
        F.when(den > 0, F.round(slope * 1000).cast("long")).alias(
            "slope_milli"
        ),
        F.when(
            den > 0,
            F.round(mean_y - slope * mean_c).cast("long"),
        ).alias("intercept_micro"),
        F.round(mean_y - mean_c).cast("long").alias("large_gap_micro"),
    )


def concordance_index(
    df: DataFrame,
    time_col: str,
    event_col,
    score_col,
    max_score: int = 39,
) -> DataFrame:
    """Harrell's C-index — concordance between a prognostic score and
    censored survival times, THE discrimination metric for survival /
    churn / retention models (it is ROC-AUC's censoring-aware
    generalization: with no censoring and binary time it degenerates
    to AUC).  Higher score must predict LONGER survival.

    Pair semantics (Harrell): a pair is comparable iff the earlier
    subject had an EVENT — (t_i < t_j, e_i=1), or (t_i = t_j, e_i=1,
    e_j=0); equal-time event pairs are not.  Concordant when the later
    survivor carries the higher score; equal scores count half.

    Scale shape — never a pair join: scores clamp to ≤ max_score+1
    buckets (declared semantics, the qb93 grid discipline), and all
    pair counts come from a (distinct time × bucket) GRID of the
    subject histogram with two PARTITIONED cumulative windows:
    per-bucket over the time spine (later-subject counts), per-time
    over the ≤40-bucket spine (score-tail sums).  Every count is exact
    int64; C = (2·concordant + tied)/(2·comparable) is one terminal
    double (numerator cast double before its 1e6 scale, qa91 rule).

    Output (single row): n, n_events, comparable, concordant,
    tied_score, c_index_micro (NULL when no comparable pairs).
    """
    e = event_col if not isinstance(event_col, str) else F.col(event_col)
    s = score_col if not isinstance(score_col, str) else F.col(score_col)
    subj = df.select(
        F.col(time_col).cast("long").alias("_t"),
        e.cast("boolean").cast("long").alias("_e"),
        F.least(s.cast("long"), F.lit(int(max_score))).alias("_b"),
    )
    cells = subj.groupBy("_t", "_b").agg(
        F.count("*").cast("long").alias("_nall"),
        F.sum("_e").cast("long").alias("_nevt"),
        F.sum(1 - F.col("_e")).cast("long").alias("_ncens"),
    )
    times = cells.select("_t").distinct()
    buckets = cells.select("_b").distinct()
    grid = (
        times.crossJoin(F.broadcast(buckets))
        .join(cells, ["_t", "_b"], "left")
        .fillna(0, subset=["_nall", "_nevt", "_ncens"])
    )
    wb = (
        Window.partitionBy("_b")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totb = Window.partitionBy("_b")
    g2 = grid.select(
        "_t",
        "_b",
        "_nevt",
        (
            F.sum("_nall").over(totb)
            - F.sum("_nall").over(wb)
            + F.col("_ncens")
        )
        .cast("long")
        .alias("_later2"),
    )
    wt = (
        Window.partitionBy("_t")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tott = Window.partitionBy("_t")
    g3 = g2.select(
        "_nevt",
        F.col("_later2").alias("_tied"),
        (F.sum("_later2").over(tott) - F.sum("_later2").over(wt))
        .cast("long")
        .alias("_conc"),
        F.sum("_later2").over(tott).cast("long").alias("_cmp"),
    ).where(F.col("_nevt") > 0)
    agg = g3.agg(
        F.sum(F.col("_nevt") * F.col("_conc")).cast("long").alias("concordant"),
        F.sum(F.col("_nevt") * F.col("_tied")).cast("long").alias("tied_score"),
        F.sum(F.col("_nevt") * F.col("_cmp")).cast("long").alias("comparable"),
    )
    tot = subj.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("_e").cast("long").alias("n_events"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n",
        "n_events",
        "comparable",
        "concordant",
        "tied_score",
        F.when(
            F.col("comparable") > 0,
            F.round(
                (2 * F.col("concordant") + F.col("tied_score")).cast(
                    "double"
                )
                * MICRO
                / (2 * F.col("comparable"))
            ).cast("long"),
        ).alias("c_index_micro"),
    )


def spiegelhalter_z(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
) -> DataFrame:
    """Spiegelhalter's Z — the significance TEST for calibration,
    completing the descriptive battery on the same equi-width bins as
    ECE (qa82) / Hosmer-Lemeshow (qc23) / slope-intercept (qc43):
    under perfect calibration Z ~ N(0,1), so |Z| > 1.96 rejects
    without any df bookkeeping:

        Z = Σ (y−p)(1−2p) / sqrt(Σ (1−2p)²·p·(1−p))

    Integer plan: with exact midpoint micro confidence cf and
    q = 1e6 − 2·cf, each bin's numerator (pos·1e6 − n·cf)·q is pure
    int64; the variance term overflows int64 so it is micro-rounded
    per BIN from one fixed double DAG then integer-summed (qb13
    discipline).  Final Z is one division over one correctly-rounded
    sqrt.

    Output (single row): n, n_bins_used, num_micro2 (Σ(y−p)(1−2p) in
    micro² = 1e-12 units), var_micro, z_milli (NULL when the variance is zero).
    """
    base = df.select(
        (
            score_col if not isinstance(score_col, str) else F.col(score_col)
        )
        .cast("long")
        .alias("_s"),
        (
            label_col if not isinstance(label_col, str) else F.col(label_col)
        )
        .cast("boolean")
        .cast("long")
        .alias("_y"),
    )
    ext = base.groupBy().agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    nb = int(n_bins)
    binned = base.crossJoin(F.broadcast(ext)).select(
        F.floor(
            (F.col("_s") - F.col("_mn"))
            * nb
            / (F.col("_mx") - F.col("_mn") + 1)
        )
        .cast("long")
        .alias("bin"),
        "_y",
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    cf = ((2 * F.col("bin") + 1) * F.lit(MICRO) / F.lit(2 * nb)).cast("long")
    q = F.lit(MICRO) - 2 * cf
    terms = per.select(
        "_n",
        ((F.col("_pos") * F.lit(MICRO) - F.col("_n") * cf) * q)
        .cast("long")
        .alias("_num"),
        F.round(
            F.col("_n")
            * (q.cast("double") / MICRO)
            * (q.cast("double") / MICRO)
            * (cf.cast("double") / MICRO)
            * ((F.lit(MICRO) - cf).cast("double") / MICRO)
            * MICRO
        )
        .cast("long")
        .alias("_var"),
    )
    agg = terms.groupBy().agg(
        F.count("*").cast("long").alias("n_bins_used"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_num").cast("long").alias("num_micro2"),
        F.sum("_var").cast("long").alias("var_micro"),
    )
    return agg.select(
        "n",
        "n_bins_used",
        "num_micro2",
        "var_micro",
        F.when(
            F.col("var_micro") > 0,
            F.round(
                F.col("num_micro2").cast("double")
                / F.lit(1e12)
                / F.sqrt(F.col("var_micro").cast("double") / MICRO)
                * 1000
            ).cast("long"),
        ).alias("z_milli"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 20,
) -> DataFrame:
    """Isotonic (monotone nondecreasing) calibration fit over the
    equal-width confidence bins shared with qa82/qc13/qc23/qc43 —
    the nonparametric recalibration map.  Instead of the sequential
    pool-adjacent-violators sweep (data-dependent iteration count, a
    poor fit for a static plan), the fit uses the EXACT minimax
    identity (Robertson et al. 1988):

        iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k])

    over the B occupied bins: interval means come from prefix-sum
    differences of the bin table (integer pos/count sums), each
    micro-rounded ONCE (per-cell rule, so the min/max lattice runs on
    int64), and the j<=i<=k lattice is B³ rows of a bounded dimension
    table — never row-level.  Windows run over the occupied-bin spine
    only (allowlisted bounded class).

    Output per occupied bin: bin, r (dense index), n, pos,
    rate_micro, iso_micro (nondecreasing in r by construction).
    """
    base = df.select(
        (score_col if not isinstance(score_col, str) else F.col(score_col))
        .cast("long")
        .alias("_s"),
        (label_col if not isinstance(label_col, str) else F.col(label_col))
        .cast("boolean")
        .cast("long")
        .alias("_y"),
    )
    ext = base.groupBy().agg(
        F.min("_s").alias("_mn"), F.max("_s").alias("_mx")
    )
    nb = int(n_bins)
    bins = (
        base.crossJoin(F.broadcast(ext))
        .select(
            F.floor(
                (F.col("_s") - F.col("_mn"))
                * nb
                / (F.col("_mx") - F.col("_mn") + 1)
            )
            .cast("long")
            .alias("bin"),
            "_y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_y").cast("long").alias("pos"),
        )
    )
    wr = Window.orderBy("bin")
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref = bins.select(
        "bin",
        "n",
        "pos",
        F.row_number().over(wr).cast("long").alias("r"),
        F.sum("n").over(wcum).cast("long").alias("_cn"),
        F.sum("pos").over(wcum).cast("long").alias("_cp"),
    )
    lo = pref.select(
        F.col("r").alias("_j"),
        (F.col("_cn") - F.col("n")).alias("_cn0"),
        (F.col("_cp") - F.col("pos")).alias("_cp0"),
    )
    hi = pref.select(
        F.col("r").alias("_k"),
        F.col("_cn").alias("_cn1"),
        F.col("_cp").alias("_cp1"),
    )
    intervals = (
        lo.join(hi, F.col("_j") <= F.col("_k"))
        .select(
            "_j",
            "_k",
            F.round(
                (F.col("_cp1") - F.col("_cp0")).cast("double")
                * 1_000_000
                / (F.col("_cn1") - F.col("_cn0"))
            )
            .cast("long")
            .alias("_m"),
        )
    )
    idx = pref.select(F.col("r").alias("_i"))
    inner = (
        intervals.join(
            idx,
            (F.col("_j") <= F.col("_i")) & (F.col("_i") <= F.col("_k")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_m").alias("_minm"))
    )
    iso = inner.groupBy("_i").agg(F.max("_minm").cast("long").alias("iso_micro"))
    return (
        pref.join(iso, pref["r"] == iso["_i"])
        .select(
            "bin",
            "r",
            "n",
            "pos",
            F.round(F.col("pos").cast("double") * 1_000_000 / F.col("n"))
            .cast("long")
            .alias("rate_micro"),
            "iso_micro",
        )
    )


def rbp_weights(k: int = 10, p_num: int = 3, p_den: int = 4) -> list[int]:
    """Integer RBP position weights: W_k = p_num^(k-1) ·
    p_den^(K-k), so that (1-p)·p^(k-1) = W_k / p_den^K exactly for
    p = p_num/p_den·(1-p normalization folds into the shared
    denominator: Σ_k (1-p)p^(k-1) = (p_den-p_num)/p_den · … — with
    the default p = 3/4 the prefactor 1/4 makes W sum to
    p_den^K·(1 − p^K)).  Computed ONCE in Python, injected into BOTH
    engines (qa89 constant-table rule) — the whole RBP is integer
    until one terminal division by p_den^K."""
    return [p_num ** (j - 1) * p_den ** (k - j) for j in range(1, k + 1)]


def rbp_at_k(
    ranked: DataFrame,
    group_col: str,
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Rank-biased precision at k with persistence p = 3/4 (Moffat &
    Zobel 2008) — the user-model ranking metric where NDCG's log
    discount is replaced by a geometric "keep scanning" probability;
    truncation at k leaves the standard residual (1−p)·Σ_{j>k} ≈
    p^k unassigned, reported for honesty.

    p = 3/4 is dyadic-rational, so every position weight is an exact
    INTEGER over the common denominator 4^k (`rbp_weights`, injected
    both engines): per-group sums are int64, rbp is one terminal
    division, and the corpus mean is a second single division of
    integer sums.

    Output per group: group, hits_w (integer weighted sum),
    rbp_micro, residual_micro (same for all rows), mean_rbp_micro
    (broadcast single-row join).
    """
    weights = rbp_weights(k)
    denom = 4 ** k
    residual = round((1 - sum(weights) / denom) * 1_000_000)
    warr = F.lit(weights)
    per = (
        ranked.where(F.col(rank_col) <= k)
        .select(
            F.col(group_col).alias("_g"),
            F.when(
                F.col(rel_col) >= 1,
                F.element_at(warr, F.col(rank_col).cast("int")),
            )
            .otherwise(0)
            .cast("long")
            .alias("_w"),
        )
        .groupBy("_g")
        .agg(F.sum("_w").cast("long").alias("hits_w"))
    )
    mean = per.agg(
        F.count("*").cast("long").alias("_nq"),
        F.sum("hits_w").cast("long").alias("_sw"),
    ).select(
        F.round(
            F.col("_sw").cast("double")
            * 1_000_000
            / (F.col("_nq") * F.lit(denom))
        )
        .cast("long")
        .alias("mean_rbp_micro")
    )
    return per.crossJoin(F.broadcast(mean)).select(
        F.col("_g").alias(group_col),
        "hits_w",
        F.round(F.col("hits_w") * 1_000_000 / F.lit(denom))
        .cast("long")
        .alias("rbp_micro"),
        F.lit(int(residual)).cast("long").alias("residual_micro"),
        "mean_rbp_micro",
    )


def pass_at_k_table(n: int, ks: tuple[int, ...]) -> list[tuple]:
    """Injected integer table for the unbiased pass@k estimator
    (Chen et al. 2021, HumanEval): rows (k, c, numer, denom) with
    numer = C(n−c, k), denom = C(n, k), so
    pass@k = (denom − numer)/denom EXACTLY for every correct-count
    c = 0..n.  Computed once in Python (math.comb), shared by both
    engines (qa89 constant-table rule)."""
    import math

    rows = []
    for k in ks:
        denom = math.comb(n, k)
        for c in range(n + 1):
            numer = math.comb(n - c, k) if n - c >= k else 0
            rows.append((int(k), int(c), int(numer), int(denom)))
    return rows


def pass_at_k(
    df: DataFrame,
    task_col: str,
    correct_col,
    order_cols: list[str],
    n: int = 10,
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """Unbiased pass@k over a FIXED n-attempt budget per task — the
    standard code/reasoning eval estimator: with c of the first n
    attempts correct, pass@k = 1 − C(n−c,k)/C(n,k) (never the biased
    1−(1−c/n)^k).  Tasks with fewer than n attempts are excluded
    (both engines), attempts are the first n by a total arrival
    order — the qc61 bounded-audit-sample discipline, so the
    combinatorial table is flat forever.

    Everything is integer against the injected `pass_at_k_table`:
    per-task pass is (denom−numer)/denom micro-rounded once; the
    macro average is Σ n_c·(denom−numer_c) over the c-histogram with
    ONE division — no per-task floating point at all.

    Output per (k, c): k, c, n_tasks, pass_micro, macro_pass_micro
    (per-k, broadcast).
    """
    cc = (
        correct_col
        if not isinstance(correct_col, str)
        else F.col(correct_col)
    )
    base = df.select(
        F.col(task_col).alias("_t"),
        cc.cast("int").alias("_y"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
    )
    wr = Window.partitionBy("_t").orderBy(
        *[F.col(f"_o{i}") for i in range(len(order_cols))]
    )
    per_task = (
        base.select("_t", "_y", F.row_number().over(wr).alias("_rn"))
        .where(F.col("_rn") <= int(n))
        .groupBy("_t")
        .agg(
            F.count("*").cast("long").alias("_ns"),
            F.sum("_y").cast("long").alias("_c"),
        )
        .where(F.col("_ns") == int(n))
    )
    chist = per_task.groupBy("_c").agg(
        F.count("*").cast("long").alias("n_tasks")
    )
    tbl = df.sparkSession.createDataFrame(
        pass_at_k_table(int(n), ks), ["k", "c", "numer", "denom"]
    )
    joined = chist.join(
        F.broadcast(tbl), chist["_c"] == tbl["c"]
    ).select(
        "k",
        "c",
        "n_tasks",
        "numer",
        "denom",
        F.round((F.col("denom") - F.col("numer")) * 1_000_000 / F.col("denom"))
        .cast("long")
        .alias("pass_micro"),
    )
    macro = joined.groupBy(F.col("k").alias("_k")).agg(
        F.round(
            F.sum(F.col("n_tasks") * (F.col("denom") - F.col("numer")))
            .cast("double")
            * 1_000_000
            / (F.max("denom") * F.sum("n_tasks"))
        )
        .cast("long")
        .alias("macro_pass_micro")
    )
    return joined.join(macro, joined["k"] == macro["_k"]).select(
        F.col("k").cast("long").alias("k"),
        F.col("c").cast("long").alias("c"),
        "n_tasks",
        "pass_micro",
        "macro_pass_micro",
    )


def conformal_alpha_curve(
    df: DataFrame,
    score_col,
    id_col: str,
    alphas_bp: tuple[int, ...] = (2000, 1000, 500, 200),
    cal_fraction_micro: int = 500_000,
    salt: str = "conformal",
) -> DataFrame:
    """Split-conformal coverage/threshold TRADEOFF curve over an
    alpha grid — qb18 answers "does 90% cover?"; this answers "what
    does each risk level cost in threshold width?", the table you
    read before committing an alpha to production.

    Same deterministic machinery as `conformal_split_coverage`
    (md5-salt 40-bit split, rank read off the score histogram's
    cumulative counts — never a global sort); the grid joins as a
    broadcast dimension so all alphas share ONE histogram pass.
    rank_k = ceil((n_cal+1)·(1−α)) clamped to n_cal, exact integer.

    Output per alpha: alpha_bp, target_micro, n_cal, n_test, rank_k,
    q_hat, coverage_micro.
    """
    s = (
        score_col if not isinstance(score_col, str) else F.col(score_col)
    ).cast("long")
    h40 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    thr = (int(cal_fraction_micro) << 40) // 1_000_000
    base = df.select(s.alias("_s"), (h40 < F.lit(thr)).alias("_is_cal"))
    hist = base.groupBy("_s").agg(
        F.sum(F.col("_is_cal").cast("long")).cast("long").alias("_nc"),
        F.sum((~F.col("_is_cal")).cast("long")).cast("long").alias("_nt"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = hist.select(
        "_s",
        "_nt",
        F.sum("_nc").over(wcum).cast("long").alias("_cum_cal"),
        F.sum("_nc").over(wall).cast("long").alias("_n_cal"),
        F.sum("_nt").over(wall).cast("long").alias("_n_test"),
    )
    grid = df.sparkSession.createDataFrame(
        [(int(a),) for a in alphas_bp], ["alpha_bp"]
    )
    st2 = staged.crossJoin(F.broadcast(grid)).select(
        "*",
        F.least(
            F.expr(
                "((_n_cal + 1) * (10000 - alpha_bp) + 9999) div 10000"
            ),
            F.col("_n_cal"),
        ).alias("_k"),
    )
    qhat = (
        st2.where(F.col("_cum_cal") >= F.col("_k"))
        .groupBy("alpha_bp")
        .agg(
            F.min("_s").cast("long").alias("q_hat"),
            F.max("_n_cal").alias("n_cal"),
            F.max("_n_test").alias("n_test"),
            F.max("_k").cast("long").alias("rank_k"),
        )
    )
    cov = (
        hist.crossJoin(F.broadcast(qhat.select("alpha_bp", "q_hat")))
        .where(F.col("_s") <= F.col("q_hat"))
        .groupBy("alpha_bp")
        .agg(F.sum("_nt").cast("long").alias("_ncov"))
    )
    return (
        qhat.join(cov, "alpha_bp")
        .select(
            F.col("alpha_bp").cast("long").alias("alpha_bp"),
            ((10_000 - F.col("alpha_bp")) * 100).cast("long").alias(
                "target_micro"
            ),
            "n_cal",
            "n_test",
            "rank_k",
            "q_hat",
            F.when(
                F.col("n_test") > 0,
                F.round(F.col("_ncov") * 1_000_000 / F.col("n_test"))
                .cast("long"),
            ).alias("coverage_micro"),
        )
    )
