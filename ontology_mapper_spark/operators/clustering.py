"""Integer-exact distributed k-means (Lloyd) over embedding columns.

Embedding clustering is the workhorse behind corpus curation at scale
(SemDeDup prunes within k-means clusters; domain mixing weights come
from cluster histograms), so the engine ships it as a first-class
operator next to IVF (operators/similarity.py — which is one Lloyd
assignment step with md5-deterministic centroids; this adds the
iterations).

Scale shape — the canonical distributed k-means:
  * vectors stay put; per-iteration work is one map-only assignment
    pass (distances against a DRIVER-BROADCAST k×dim centroid literal,
    computed with `zip_with`+`aggregate` inside codegen — no shuffle,
    no Python) plus ONE groupBy(cluster, dim) partial-aggregated sum
    for the centroid update;
  * the only driver-side data ever collected is the k×dim centroid
    table itself (k=8, dim=64 here — bytes, not data), which is the
    synchronization point every distributed k-means has.

Determinism / oracle-exactness: vectors are micro-fixed-point bigints
(round(x*1e6)), distances are integer L2², assignment ties break on
cluster id via lexicographic struct min, centroid updates use
truncating integer division (DuckDB `//` semantics), empty clusters
carry their previous centroid. Zero floating-point accumulation ⇒
hash-exact against an unrolled-CTE DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _trunc_div(s: int, n: int) -> int:
    """C-style truncation toward zero (DuckDB's `//` on integers;
    Python's `//` floors, which differs on negative sums)."""
    q = abs(s) // n
    return q if s >= 0 else -q


def micro_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, ev): embedding as micro-fixed-point bigint array."""
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.round(x * MICRO).cast("long"),
        ).alias("ev"),
    )


def _dist_expr(cvec: list[int]):
    """Integer L2² distance of column `ev` to a literal centroid."""
    return F.aggregate(
        F.zip_with(F.col("ev"), F.lit(cvec), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_micro(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Lloyd's algorithm, `iters` rounds, md5-deterministic init.

    Returns the final per-vector assignment:
    (id, cluster, dist) with dist = integer L2² to the assigning
    centroid (i.e. the centroid from the LAST completed update).
    Callers aggregate as needed (see contract qa02 for the per-cluster
    summary form).
    """
    vecs = micro_vectors(df, id_col, vec_col).persist()
    try:
        # deterministic seeds: the k vectors with the smallest md5(id)
        seed_ids = [
            r[id_col]
            for r in (
                df.select(id_col)
                .withColumn("_h", F.md5(F.col(id_col).cast("string")))
                .orderBy("_h")
                .limit(k)
                .collect()
            )
        ]
        by_id = {
            r[id_col]: list(r["ev"])
            for r in vecs.where(F.col(id_col).isin(seed_ids)).collect()
        }
        cents = [by_id[i] for i in seed_ids]  # cluster j = index j+1

        assign = None
        for _ in range(iters):
            m = F.array_min(
                F.array(
                    *[
                        F.struct(
                            _dist_expr(c).alias("dist"),
                            F.lit(j + 1).cast("int").alias("cl"),
                        )
                        for j, c in enumerate(cents)
                    ]
                )
            )
            assign = vecs.select(
                F.col(id_col),
                "ev",
                m["cl"].alias("cluster"),
                m["dist"].alias("dist"),
            )
            upd = (
                assign.select("cluster", F.posexplode("ev").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new_cents = [list(c) for c in cents]  # carry old when empty
            for r in upd:
                new_cents[r["cluster"] - 1][r["pos"]] = _trunc_div(r["s"], r["n"])
            cents = new_cents

        out = assign.select(id_col, "cluster", "dist")
        # final centroids exposed for callers that need them
        out._kmeans_centroids = cents  # type: ignore[attr-defined]
        return out
    finally:
        vecs.unpersist()


def centroid_silhouette(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Per-cluster centroid-silhouette quality of a k-means partition —
    the O(N·k) simplification of the silhouette score (distance to own
    vs nearest-other CENTROID instead of all-pairs member distances)
    that's the only silhouette you can afford at corpus scale, and the
    standard "did k make sense?" gate before cluster-based curation
    (SemDeDup pruning, domain mixing) trusts the partition.

    Runs the same integer-micro Lloyd iterations as `kmeans_micro`,
    then ONE extra map-only pass: distances to all k FINAL centroids as
    a sorted literal-struct array — own cluster and runner-up fall out
    of the first two elements, no shuffle, no Python.  s = (b − a) /
    max(a, b) stays a single integer division per row, micro-rounded;
    per-cluster means are one division over bigint sums.

    Output per cluster: n_members, mean_s_micro, min_s_micro,
    max_s_micro (s in [-1e6, 1e6]; degenerate a=b=0 rows score 0).
    """
    assign = kmeans_micro(df, id_col, vec_col, k=k, iters=iters)
    cents = assign._kmeans_centroids
    vecs = micro_vectors(df, id_col, vec_col)
    arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    _dist_expr(c).alias("dist"),
                    F.lit(j + 1).cast("int").alias("cl"),
                )
                for j, c in enumerate(cents)
            ]
        )
    )
    staged = vecs.select(
        F.col(id_col),
        arr[0]["cl"].alias("cluster"),
        arr[0]["dist"].alias("_a"),
        arr[1]["dist"].alias("_b"),
    )
    # (b-a)*1e6 overflows int64 once dists pass ~9e12 (far vectors ×
    # 64 dims); the ratio as a double DAG over bigint inputs is engine-
    # exact and unbounded.
    s = F.when(
        F.greatest(F.col("_b"), F.col("_a")) > 0,
        F.round(
            (F.col("_b") - F.col("_a")).cast("double")
            * F.lit(MICRO)
            / F.greatest(F.col("_a"), F.col("_b"))
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = staged.select("cluster", s.alias("_s")).groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("_s").cast("long").alias("_ss"),
        F.min("_s").cast("long").alias("min_s_micro"),
        F.max("_s").cast("long").alias("max_s_micro"),
    )
    return agg.select(
        F.col("cluster").cast("long"),
        "n_members",
        F.round(F.col("_ss").cast("double") / F.col("n_members"))
        .cast("long")
        .alias("mean_s_micro"),
        "min_s_micro",
        "max_s_micro",
    )


def cluster_agreement(
    assigned: DataFrame,
    id_col: str,
    cluster_col: str,
    gold_col: str,
) -> DataFrame:
    """External clustering-quality metrics against a gold labeling:
    B-cubed precision/recall/F1 (Bagga & Baldwin 1998 — the standard
    entity-resolution score, element-weighted so giant clusters can't
    hide errors) and the pair-counting Adjusted Rand Index — the two
    numbers a canonicalization / dedup-cluster run reports before its
    output is trusted.

    Everything flows from ONE (cluster, gold) contingency table:

        B³P = (1/N)·Σ_cells n²/|C|      B³R = (1/N)·Σ_cells n²/|G|
        ARI from Σ C(n,2) over cells / rows / cols (exact bigints)

    Per-cell n²/|C| terms are micro-rounded then integer-summed (the
    qa64 discipline — never an order-dependent double sum); ARI's
    binomials stay bigint with one terminal double DAG.  Cost: one
    shuffle for the contingency; the rest runs on |C|·|G| cells.

    Output (single row): n, n_clusters, n_gold, b3_p_micro, b3_r_micro,
    b3_f1_micro, ari_micro.
    """
    cells = (
        assigned.select(
            F.col(cluster_col).alias("_c"), F.col(gold_col).alias("_g")
        )
        .groupBy("_c", "_g")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    rows = cells.groupBy("_c").agg(F.sum("_n").cast("long").alias("_rc"))
    cols = cells.groupBy("_g").agg(F.sum("_n").cast("long").alias("_gc"))
    j = cells.join(F.broadcast(rows), "_c").join(F.broadcast(cols), "_g")
    terms = j.select(
        "_n",
        F.round(
            F.col("_n").cast("double") * F.col("_n") / F.col("_rc") * MICRO
        ).cast("long").alias("_tp"),
        F.round(
            F.col("_n").cast("double") * F.col("_n") / F.col("_gc") * MICRO
        ).cast("long").alias("_tr"),
        (F.col("_n") * (F.col("_n") - 1) / 2).cast("long").alias("_pair"),
    )
    base = terms.agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_tp").cast("long").alias("_sp"),
        F.sum("_tr").cast("long").alias("_sr"),
        F.sum("_pair").cast("long").alias("_a"),
    )
    rp = rows.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum(F.col("_rc") * (F.col("_rc") - 1) / 2).cast("long").alias("_b"),
    )
    cp = cols.agg(
        F.count("*").cast("long").alias("n_gold"),
        F.sum(F.col("_gc") * (F.col("_gc") - 1) / 2).cast("long").alias("_cb"),
    )
    out = base.crossJoin(F.broadcast(rp)).crossJoin(F.broadcast(cp))
    p = F.col("_sp").cast("double") / F.col("n")
    r = F.col("_sr").cast("double") / F.col("n")
    tot = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    exp = F.col("_b").cast("double") * F.col("_cb") / tot
    mx = (F.col("_b") + F.col("_cb")).cast("double") / 2.0
    return out.select(
        "n",
        "n_clusters",
        "n_gold",
        F.round(p).cast("long").alias("b3_p_micro"),
        F.round(r).cast("long").alias("b3_r_micro"),
        F.round(2.0 * p * r / (p + r)).cast("long").alias("b3_f1_micro"),
        F.when(
            mx - exp != 0.0,
            F.round(
                (F.col("_a").cast("double") - exp) * MICRO / (mx - exp)
            ).cast("long"),
        ).alias("ari_micro"),
    )


def _ln_micro(col: F.Column) -> F.Column:
    """round(ln(x)*1e6) as bigint — one ln per integer it's applied to."""
    return F.round(F.log(col.cast("double")) * MICRO).cast("long")


def label_agreement_info(
    assigned: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Information-theoretic agreement between two labelings — the
    third view next to cluster_agreement's pair-counting ARI and
    element-weighted B³: normalized mutual information (the number
    every clustering paper reports) and variation of information
    (Meilă 2007 — a true METRIC on partitions, so it composes across
    pipeline stages where NMI does not).

    Everything reduces to integer sums over ONE (x, y) contingency
    table (q66 log discipline — ln taken ONCE per distinct integer
    count, micro-rounded, then integer-weighted sums; never a double
    accumulation):

        S_Hx = N·ln_µ(N) − Σ_x c_x·ln_µ(c_x)          (= N·H(X) µnats)
        S_I  = Σ_xy c_xy·(ln_µ N + ln_µ c_xy − ln_µ c_x − ln_µ c_y)
        NMI  = 2·S_I / (S_Hx + S_Hy)                  (N cancels)
        VI   = (S_Hx + S_Hy − 2·S_I) / N

    Cost: one contingency shuffle; margins broadcast back onto the
    |X|·|Y| cells.  int64 bound: S terms ≤ N·ln(N)·1e6 — safe past
    10^11 rows; the NMI numerator is cast double BEFORE its 1e6 scale
    (the qa91 overflow rule).

    Output (single row): n, n_x, n_y, n_cells, hx_micro, hy_micro,
    mi_micro, nmi_micro (NULL when both labelings are constant),
    vi_micro.
    """
    cells = (
        assigned.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .groupBy("_x", "_y")
        .agg(F.count("*").cast("long").alias("_n"))
    )
    rows = cells.groupBy("_x").agg(F.sum("_n").cast("long").alias("_rx"))
    cols = cells.groupBy("_y").agg(F.sum("_n").cast("long").alias("_ry"))
    tot = cells.agg(F.sum("_n").cast("long").alias("_tn"))
    sx = rows.agg(
        F.count("*").cast("long").alias("n_x"),
        F.sum(F.col("_rx") * _ln_micro(F.col("_rx")))
        .cast("long")
        .alias("_sx"),
    )
    sy = cols.agg(
        F.count("*").cast("long").alias("n_y"),
        F.sum(F.col("_ry") * _ln_micro(F.col("_ry")))
        .cast("long")
        .alias("_sy"),
    )
    mi = (
        cells.join(F.broadcast(rows), "_x")
        .join(F.broadcast(cols), "_y")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("_n")
                * (
                    _ln_micro(F.col("_tn"))
                    + _ln_micro(F.col("_n"))
                    - _ln_micro(F.col("_rx"))
                    - _ln_micro(F.col("_ry"))
                )
            )
            .cast("long")
            .alias("_t")
        )
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("_t").cast("long").alias("_si"),
        )
    )
    out = (
        mi.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(sy))
    )
    hx = F.col("_tn") * _ln_micro(F.col("_tn")) - F.col("_sx")
    hy = F.col("_tn") * _ln_micro(F.col("_tn")) - F.col("_sy")
    return out.select(
        F.col("_tn").alias("n"),
        "n_x",
        "n_y",
        "n_cells",
        F.round(hx / F.col("_tn")).cast("long").alias("hx_micro"),
        F.round(hy / F.col("_tn")).cast("long").alias("hy_micro"),
        F.round(F.col("_si") / F.col("_tn")).cast("long").alias("mi_micro"),
        F.when(
            hx + hy > 0,
            F.round(
                (2 * F.col("_si")).cast("double") * MICRO / (hx + hy)
            ).cast("long"),
        ).alias("nmi_micro"),
        F.round((hx + hy - 2 * F.col("_si")) / F.col("_tn"))
        .cast("long")
        .alias("vi_micro"),
    )
