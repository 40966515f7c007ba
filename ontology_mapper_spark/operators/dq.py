"""Data-quality audits: referential integrity + column profiling.

The warehouse-hygiene pair every ingest pipeline runs before anything
downstream trusts the tables.  Both are pure aggregate shapes:

* `referential_integrity` — per declared FK relation, the child row
  count and the orphan count (child keys with no matching parent) via a
  left-anti join on the key.  At 100 TB each relation is one shuffled
  (or AQE-broadcast, when the parent is dimension-sized) join + one
  count; relations are independent so the driver unions seven tiny
  1-row aggregates.
* `profile_columns` — one row per declared column with null count,
  exact distinct count, and lexicographic min/max of the STRING
  rendering (the documented contract: a profile row must be one stable
  type across heterogeneous columns, so everything is rendered
  `CAST(col AS STRING)` first; numeric min/max belong to per-column
  stats, not the profile).  Implemented as an unpivot (stack) into
  (column, value) rows + ONE hash aggregate — a single scan of the
  table regardless of column count, map-side partial aggregation, no
  per-column jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def referential_integrity(
    relations: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """FK-integrity audit over declared (name, child_df, child_key,
    parent_df, parent_key) relations.

    NULL child keys are counted separately (`n_null_keys`) and are NOT
    orphans — SQL FK semantics, where a null FK is 'not participating'.
    Output: (relation, n_child, n_null_keys, n_orphans,
    orphan_micro) with orphan_micro = orphans/(non-null children) in
    micro-units (single division per 1-row relation aggregate).
    """
    parts = []
    for name, child, ckey, parent, pkey in relations:
        keys = child.select(F.col(ckey).alias("_k"))
        pk = parent.select(F.col(pkey).alias("_k")).distinct()
        orphans = keys.where(F.col("_k").isNotNull()).join(
            pk, "_k", "left_anti"
        )
        base = keys.agg(
            F.count("*").cast("long").alias("n_child"),
            F.sum(F.col("_k").isNull().cast("long"))
            .cast("long")
            .alias("n_null_keys"),
        )
        orc = orphans.agg(F.count("*").cast("long").alias("n_orphans"))
        parts.append(
            base.join(orc)  # 1-row × 1-row
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_keys",
                "n_orphans",
                F.when(
                    F.col("n_child") > F.col("n_null_keys"),
                    F.round(
                        F.col("n_orphans")
                        * F.lit(MICRO)
                        / (F.col("n_child") - F.col("n_null_keys"))
                    ).cast("long"),
                ).alias("orphan_micro"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_columns(
    df: DataFrame, columns: Sequence[str]
) -> DataFrame:
    """Single-scan column profile: one output row per declared column.

    Output: (column, n_rows, n_nulls, n_distinct, min_str, max_str)
    where min/max/distinct are over the STRING rendering (see module
    docstring) and n_distinct EXCLUDES null (SQL count-distinct
    semantics, mirrored by the oracle).
    """
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    long_form = df.select(
        F.expr(
            f"stack({len(columns)}, {pairs}) AS (_col, _val)"
        )
    )
    return long_form.groupBy(F.col("_col").alias("column")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("_val").isNull().cast("long"))
        .cast("long")
        .alias("n_nulls"),
        F.countDistinct("_val").cast("long").alias("n_distinct"),
        F.min("_val").alias("min_str"),
        F.max("_val").alias("max_str"),
    )


def expectations_report(
    df: DataFrame,
    rules: Sequence[dict],
    min_pass_micro: int = 1_000_000,
) -> DataFrame:
    """Declarative data-contract validation ("expectations suite"):
    a RULES list evaluated over the table in ONE scan — the ingest
    gate that runs before anything downstream trusts a 100 TB drop.
    Row-level rules (not_null / range / in_set / regex / expr) become
    sum(CASE) columns of a single hash aggregate (map-side
    combinable); `unique` rules ride the same aggregate as exact
    count(DISTINCT col).  The per-rule layout is a stack() unpivot of
    that ONE result row — rule count never adds scans or shuffles.

    Rule dicts: {rule_id, column, type, ...}:
      not_null                       — col IS NOT NULL
      range {lo, hi}                 — lo <= col <= hi (inclusive)
      in_set {values: [..]}          — col IN values
      regex {pattern}                — col RLIKE pattern (keep the
                                       pattern RE2-portable)
      expr {sql}                     — arbitrary boolean SQL over the
                                       row (cross-field consistency)
      unique                         — n_pass = exact distinct count,
                                       passes iff distinct == n_rows

    Output per rule: (rule_id, column_name, rule_type, n_rows,
    n_pass, pass_micro, ok) with ok = pass_micro >= min_pass_micro
    on the ROUNDED share.
    """
    aggs = [F.count("*").cast("long").alias("_n")]
    for i, r in enumerate(rules):
        c, t = r["column"], r["type"]
        if t == "not_null":
            cond = F.col(c).isNotNull()
        elif t == "range":
            cond = (F.col(c) >= r["lo"]) & (F.col(c) <= r["hi"])
        elif t == "in_set":
            cond = F.col(c).isin(list(r["values"]))
        elif t == "regex":
            cond = F.col(c).rlike(r["pattern"])
        elif t == "expr":
            cond = F.expr(r["sql"])
        elif t == "unique":
            aggs.append(
                F.countDistinct(F.col(c)).cast("long").alias(f"_p{i}")
            )
            continue
        else:  # pragma: no cover - declared contract
            raise ValueError(f"unknown expectation type: {t}")
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_p{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{rid}', '{col}', '{typ}', _p{i}".format(
            rid=r["rule_id"], col=r["column"], typ=r["type"], i=i
        )
        for i, r in enumerate(rules)
    )
    rows = one.select(
        F.col("_n"),
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS "
            "(rule_id, column_name, rule_type, n_pass)"
        ),
    )
    share = F.when(
        F.col("_n") > 0,
        F.round(F.col("n_pass") * F.lit(1_000_000) / F.col("_n")).cast(
            "long"
        ),
    )
    return rows.select(
        "rule_id",
        "column_name",
        "rule_type",
        F.col("_n").alias("n_rows"),
        F.col("n_pass").cast("long").alias("n_pass"),
        share.alias("pass_micro"),
        F.when(share.isNotNull(), (share >= int(min_pass_micro)))
        .cast("long")
        .alias("ok"),
    )


def fd_audit(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Approximate functional-dependency audit for a list of column
    pairs A→B — the schema-discovery / data-contract profiler: does A
    determine B exactly, and if not, how far off is it by the g3
    measure (Kivinen & Mannila 1995: the minimum fraction of rows to
    DELETE for the FD to hold — n − Σ_A max_B count(A,B), all
    integers)?

    One (A,B) cell aggregation per pair (map-side combine absorbs hot
    keys), then a per-A max/sum rollup; the per-pair outputs union.
    fd_holds is the exact test distinct(A,B) = distinct(A).

    Output per pair: lhs, rhs, n_rows, n_lhs, n_pairs, fd_holds,
    g3_violations, g3_micro.
    """
    outs = []
    for a, b in pairs:
        cells = (
            df.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
            .groupBy("_a", "_b")
            .agg(F.count("*").cast("long").alias("_c"))
        )
        per_a = cells.groupBy("_a").agg(
            F.sum("_c").cast("long").alias("_na"),
            F.max("_c").cast("long").alias("_mx"),
            F.count("*").cast("long").alias("_nb"),
        )
        agg = per_a.agg(
            F.sum("_na").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_lhs"),
            F.sum("_nb").cast("long").alias("n_pairs"),
            F.sum(F.col("_na") - F.col("_mx")).cast("long").alias(
                "g3_violations"
            ),
        )
        outs.append(
            agg.select(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                "n_rows",
                "n_lhs",
                "n_pairs",
                (F.col("n_pairs") == F.col("n_lhs")).alias("fd_holds"),
                "g3_violations",
                F.round(F.col("g3_violations") * 1_000_000 / F.col("n_rows"))
                .cast("long")
                .alias("g3_micro"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def uncertainty_coefficient(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Theil's uncertainty coefficient U(B|A) per column pair — the
    information-theoretic sibling of `fd_audit`: what fraction of
    B's entropy does knowing A remove?  U = (H(B) − H(B|A)) / H(B),
    1 = functional dependence, 0 = independence.

    All entropies use the q66 integer idiom over ONE (A,B) cell
    table: H(B) from the B margin (n·ln_micro(n) − Σ c_b·ln_micro(c_b)
    over n), H(B|A) from cell counts against their A-margin
    (Σ_cells c·(ln_micro(n_a) − ln_micro(c)) over n) — integer sums
    with one rounded division each, then one terminal ratio to micro.
    H(B)=0 (constant column) yields NULL U.

    Output per pair: lhs, rhs, n_rows, h_b_micro, h_b_given_a_micro,
    u_micro.
    """
    lnm = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")
    outs = []
    for a, b in pairs:
        cells = (
            df.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
            .groupBy("_a", "_b")
            .agg(F.count("*").cast("long").alias("_c"))
        )
        amarg = cells.groupBy("_a").agg(
            F.sum("_c").cast("long").alias("_na")
        )
        bm = (
            cells.groupBy("_b")
            .agg(F.sum("_c").cast("long").alias("_cb"))
            .agg(
                F.sum("_cb").cast("long").alias("_n"),
                F.sum(F.col("_cb") * lnm(F.col("_cb")))
                .cast("long")
                .alias("_sbl"),
            )
            .select(
                "_n",
                F.round(
                    (F.col("_n") * lnm(F.col("_n")) - F.col("_sbl"))
                    / F.col("_n")
                )
                .cast("long")
                .alias("h_b_micro"),
            )
        )
        cond = (
            cells.join(amarg, "_a")
            .agg(
                F.sum(F.col("_c") * (lnm(F.col("_na")) - lnm(F.col("_c"))))
                .cast("long")
                .alias("_scl"),
                F.sum("_c").cast("long").alias("_n2"),
            )
            .select(
                F.round(F.col("_scl") / F.col("_n2"))
                .cast("long")
                .alias("h_b_given_a_micro")
            )
        )
        outs.append(
            bm.crossJoin(F.broadcast(cond)).select(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                F.col("_n").alias("n_rows"),
                "h_b_micro",
                "h_b_given_a_micro",
                F.when(
                    F.col("h_b_micro") > 0,
                    F.round(
                        (F.col("h_b_micro") - F.col("h_b_given_a_micro"))
                        .cast("double")
                        * 1_000_000
                        / F.col("h_b_micro")
                    ).cast("long"),
                ).alias("u_micro"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def gk_lambda(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Goodman–Kruskal lambda — proportional reduction in error when
    predicting B from A by the modal category, completing the
    dependence-profiler trio: fd_audit's g3 (exact deletions, qc70),
    uncertainty coefficient (entropy, qc71), and now lambda (modal
    prediction):

        λ(B|A) = (Σ_a max_b c_ab − max_b C_b) / (n − max_b C_b)

    Pure int64 throughout — cell counts, per-A maxima, the B-margin
    mode — with ONE micro-rounded division; NULL when B is constant
    (denominator 0).  One cell aggregation per pair.

    Output per pair: lhs, rhs, n_rows, sum_modal, margin_mode,
    lambda_micro.
    """
    outs = []
    for a, b in pairs:
        cells = (
            df.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
            .groupBy("_a", "_b")
            .agg(F.count("*").cast("long").alias("_c"))
        )
        per_a = cells.groupBy("_a").agg(F.max("_c").alias("_mx"))
        num1 = per_a.agg(F.sum("_mx").cast("long").alias("sum_modal"))
        marg = (
            cells.groupBy("_b")
            .agg(F.sum("_c").cast("long").alias("_cb"))
            .agg(
                F.max("_cb").cast("long").alias("margin_mode"),
                F.sum("_cb").cast("long").alias("n_rows"),
            )
        )
        outs.append(
            num1.crossJoin(F.broadcast(marg)).select(
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                "n_rows",
                "sum_modal",
                "margin_mode",
                F.when(
                    F.col("n_rows") > F.col("margin_mode"),
                    F.round(
                        (F.col("sum_modal") - F.col("margin_mode"))
                        * 1_000_000
                        / (F.col("n_rows") - F.col("margin_mode"))
                    ).cast("long"),
                ).alias("lambda_micro"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def groupkey_skew_advisor(
    df: DataFrame, key_exprs: list[tuple[str, object]]
) -> DataFrame:
    """Grouping/partition-key skew advisor — BEFORE picking a shuffle
    key, measure each candidate's group-size distribution: a key
    whose top group holds 30% of rows will straggle any join or agg
    keyed on it (the qa42/qa46 class of incident), and AQE can only
    partially save you.  Complements qa68 (join strategy) and qa74
    (post-hoc shuffle balance) with the PRE-hoc key choice.

    Per candidate: one count agg, then stats over the group-SIZE
    histogram (bounded by distinct sizes — never row-level): max,
    mean (one rounded division), max/mean skew ratio, top-group
    share, and the exact type-1 p99 group size.

    Output per candidate: key_name, n_rows, n_groups, max_size,
    mean_size_milli, skew_ratio_milli, top_share_micro, p99_size.
    """
    outs = []
    for name, expr in key_exprs:
        col = expr if not isinstance(expr, str) else F.col(expr)
        sizes = (
            df.select(col.alias("_k"))
            .groupBy("_k")
            .agg(F.count("*").cast("long").alias("_g"))
        )
        hist = sizes.groupBy("_g").agg(
            F.count("*").cast("long").alias("_c")
        )
        tot = hist.agg(
            F.sum(F.col("_g") * F.col("_c")).cast("long").alias("n_rows"),
            F.sum("_c").cast("long").alias("n_groups"),
            F.max("_g").cast("long").alias("max_size"),
        )
        wv = Window.orderBy("_g").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        p99 = (
            hist.select("_g", F.sum("_c").over(wv).alias("_cm"))
            .crossJoin(F.broadcast(tot))
            .where(
                F.col("_cm") >= F.expr("(9900 * n_groups + 9999) div 10000")
            )
            .agg(F.min("_g").cast("long").alias("p99_size"))
        )
        outs.append(
            tot.crossJoin(F.broadcast(p99)).select(
                F.lit(name).alias("key_name"),
                "n_rows",
                "n_groups",
                "max_size",
                F.round(F.col("n_rows") * 1000 / F.col("n_groups"))
                .cast("long")
                .alias("mean_size_milli"),
                F.round(
                    F.col("max_size").cast("double")
                    * 1000
                    * F.col("n_groups")
                    / F.col("n_rows")
                )
                .cast("long")
                .alias("skew_ratio_milli"),
                F.round(F.col("max_size") * 1_000_000 / F.col("n_rows"))
                .cast("long")
                .alias("top_share_micro"),
                "p99_size",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def order_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
    tol_scaled: int = 10_000,
) -> DataFrame:
    """Cross-table financial reconciliation: does each order's header
    total equal the sum of its line extensions
    Σ extendedprice·(1+tax)·(1−discount)?  The double-entry audit
    every warehouse needs and the TPC-H schema implies — run here in
    EXACT integer arithmetic: prices as cents, tax/discount as
    integer percents, so each line term is cents·(100+t)·(100−d) and
    the order-level difference diff = Σterms − header·10000 is an
    int64 ZERO when the books balance (tolerance = one cent =
    10,000 scaled units).

    One join + one agg; headerless/lineless orders surface via the
    full outer join as unmatched counts.

    Output (single row): n_orders, n_matched, n_exact,
    n_within_cent, n_header_only, n_lines_only, max_abs_diff_scaled.
    """
    li = lineitem.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 + F.round(F.col("l_tax") * 100).cast("long"))
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        )
        .cast("long")
        .alias("_lsum")
    )
    od = orders.select(
        F.col("o_orderkey").alias("_ok"),
        (F.round(F.col("o_totalprice") * 100).cast("long") * 10_000).alias(
            "_hsum"
        ),
    )
    j = od.join(li, "_ok", "full_outer").select(
        "_ok",
        "_hsum",
        "_lsum",
        (F.col("_lsum") - F.col("_hsum")).alias("_diff"),
    )
    return j.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(
            F.when(
                F.col("_hsum").isNotNull() & F.col("_lsum").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
        F.sum(F.when(F.col("_diff") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.sum(
            F.when(F.abs(F.col("_diff")) <= int(tol_scaled), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_within_cent"),
        F.sum(F.when(F.col("_lsum").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_header_only"),
        F.sum(F.when(F.col("_hsum").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_only"),
        F.max(F.abs(F.col("_diff"))).cast("long").alias(
            "max_abs_diff_scaled"
        ),
    )


def ranking_stability(
    a_ranked: DataFrame,
    b_ranked: DataFrame,
    key_col: str,
    top_k: int = 3,
) -> DataFrame:
    """Rank-stability audit between two orderings of the SAME small
    dimension (sources ranked by volume vs by quality, shards by
    size vs by cost…): Kendall tau-b over the K×K pair grid plus
    top-k set overlap — "do my two dashboards agree about who is
    big?" answered exactly.

    Inputs carry (key, rank) each — ranks are small ints from
    bounded dimension rankings (TakeOrdered upstream).  Pair
    concordance is integer comparison over the K² self-join; tau-b
    is one mirrored division; top-k overlap is a semi-join count.

    Output (single row): n_keys, concordant, discordant, tau_milli,
    topk_overlap.
    """
    j = a_ranked.select(
        F.col(key_col).alias("_k"), F.col("rank").alias("_ra")
    ).join(
        b_ranked.select(
            F.col(key_col).alias("_k"), F.col("rank").alias("_rb")
        ),
        "_k",
    )
    p = (
        j.alias("x")
        .join(j.alias("y"), F.col("x._k") < F.col("y._k"))
        .select(
            (
                (F.col("x._ra") - F.col("y._ra"))
                * (F.col("x._rb") - F.col("y._rb"))
            ).alias("_s")
        )
    )
    agg = p.agg(
        F.sum(F.when(F.col("_s") > 0, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("_s") < 0, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.count("*").cast("long").alias("_np"),
    )
    nk = j.agg(F.count("*").cast("long").alias("n_keys"))
    ov = (
        j.where(F.col("_ra") <= int(top_k))
        .where(F.col("_rb") <= int(top_k))
        .agg(F.count("*").cast("long").alias("topk_overlap"))
    )
    return (
        nk.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(ov))
        .select(
            "n_keys",
            "concordant",
            "discordant",
            F.when(
                F.col("_np") > 0,
                F.round(
                    (F.col("concordant") - F.col("discordant"))
                    * 1000
                    / F.col("_np")
                ).cast("long"),
            ).alias("tau_milli"),
            "topk_overlap",
        )
    )


def abc_analysis(
    df: DataFrame,
    key_col: str,
    revenue_col: str,
    bucket_shift: int = 16,
    a_bp: int = 8000,
    b_bp: int = 9500,
) -> DataFrame:
    """ABC (Pareto-class) analysis of revenue concentration — the
    inventory classic: class A = keys supplying the first ~80% of
    revenue, B to 95%, C the tail.  The textbook form sorts EVERY key
    by revenue (a global row-level sort); the scale-safe form here
    classifies at BUCKET granularity: per-key revenues quantize to
    2^bucket_shift-wide buckets (qb43's range-bucket idiom), the
    cumulative revenue share runs over the bounded bucket spine in
    DESCENDING bucket order, and every key in a bucket gets the
    bucket's class — deterministic, documented granularity, no
    row-level window.

    Output per class: abc_class, n_keys, revenue, share_micro.
    """
    per = (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(revenue_col).cast("long").alias("_r"),
        )
        .groupBy("_k")
        .agg(F.sum("_r").cast("long").alias("_rev"))
    )
    b = per.select(
        F.expr(f"_rev div {1 << int(bucket_shift)}").alias("_b"),
        "_rev",
    )
    hist = b.groupBy("_b").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_rev").cast("long").alias("_s"),
    )
    tot = hist.agg(F.sum("_s").cast("long").alias("_t"))
    wd = Window.orderBy(F.col("_b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cls = (
        hist.select(
            "_b", "_n", "_s", F.sum("_s").over(wd).alias("_cum")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "_n",
            "_s",
            F.when(
                (F.col("_cum") - F.col("_s")) * 10_000
                < F.lit(int(a_bp)) * F.col("_t"),
                F.lit("A"),
            )
            .when(
                (F.col("_cum") - F.col("_s")) * 10_000
                < F.lit(int(b_bp)) * F.col("_t"),
                F.lit("B"),
            )
            .otherwise(F.lit("C"))
            .alias("abc_class"),
        )
    )
    out = cls.groupBy("abc_class").agg(
        F.sum("_n").cast("long").alias("n_keys"),
        F.sum("_s").cast("long").alias("revenue"),
    )
    return out.crossJoin(F.broadcast(tot)).select(
        "abc_class",
        "n_keys",
        "revenue",
        F.round(F.col("revenue").cast("double") * 1_000_000 / F.col("_t"))
        .cast("long")
        .alias("share_micro"),
    )


def selfjoin_cardinality_audit(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join-size estimator audit for the classic self-join blowup: the
    EXACT output cardinality of df ⋈ df on ``key_col`` (Σ c_k² over
    the key histogram — computed without performing the join) next to
    the optimizer-style uniform estimate n²/d, plus how much of the
    output the top-``top_k`` hottest keys alone would produce.

    This is the pre-flight number a 100 TB pipeline checks before
    shipping any key-equi self-join (candidate generation, co-visit
    matrices, …): an err_ratio ≫ 1000 (milli) says the uniform
    assumption is off and the hot-key share says whether salting (the
    setjoin/skewjoin discipline) is mandatory.  One count agg (the
    histogram), one scalar agg, one TakeOrdered(top_k) — never a
    global sort, never the join itself.

    Output (single row): n_rows, n_keys, actual_pairs, est_pairs,
    err_ratio_milli, topk_pairs, topk_share_micro.
    """
    hist = (
        df.select(F.col(key_col).alias("_k"))
        .groupBy("_k")
        .agg(F.count("*").cast("long").alias("_c"))
    )
    dec = lambda c: c.cast("decimal(38,0)")
    tot = hist.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum(dec(F.col("_c")) * dec(F.col("_c"))).alias("_sq"),
    )
    top = (
        hist.orderBy(F.col("_c").desc(), F.col("_k"))
        .limit(int(top_k))
        .agg(F.sum(dec(F.col("_c")) * dec(F.col("_c"))).alias("_tsq"))
    )
    j = tot.crossJoin(F.broadcast(top))
    # integral `div` on decimal operands: exact floor quotient, no
    # decimal-scale rounding games; mirrors HUGEINT // in the oracle
    est = F.expr(
        "(CAST(n_rows AS DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0)))"
        " div CAST(n_keys AS DECIMAL(38,0))"
    )
    return j.select(
        "n_rows",
        "n_keys",
        F.col("_sq").cast("long").alias("actual_pairs"),
        est.cast("long").alias("est_pairs"),
        F.round(
            F.col("_sq").cast("double")
            * F.col("n_keys")
            * 1000
            / (F.col("n_rows").cast("double") * F.col("n_rows"))
        )
        .cast("long")
        .alias("err_ratio_milli"),
        F.col("_tsq").cast("long").alias("topk_pairs"),
        F.round(
            F.col("_tsq").cast("double")
            * 1_000_000
            / F.col("_sq").cast("double")
        )
        .cast("long")
        .alias("topk_share_micro"),
    )
