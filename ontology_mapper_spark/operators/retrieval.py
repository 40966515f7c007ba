"""Lexical retrieval over the document corpus (BM25 top-k).

The query-side complement of the dedup/similarity family: given a bag of
query terms, rank documents by Okapi BM25 (Robertson et al., TREC-3;
Lucene's `k1`/`b` parameterization with the +1 idf floor so scores are
always positive).

Reproducibility discipline (the q66/q72 rules):

* `ln` runs ONCE per distinct query term on a rational of exact integer
  counts (idf), never per row.
* The per-(doc, term) score is micro-rounded to a bigint immediately
  after the one floating-point expression; the per-document score is
  then an ORDER-INDEPENDENT integer sum, so partitioning can't move it.
* All floating constants (k1+1, 1−b, …) are computed once in Python and
  injected as literals into BOTH engines, so expression shape and IEEE
  results are identical.

Scale notes: tokens are filtered to the query vocabulary (a literal
`isin` — pushed into the scan) before any shuffle, so the aggregate is
O(matching tokens) not O(corpus tokens); doc length is projected BEFORE
the explode (the per-output-row re-evaluation trap); the final top-k is
`orderBy().limit(k)` which Spark executes as TakeOrdered — per-partition
heaps + a k-row merge on the driver, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 against a fixed bag of query terms.

    score(d) = Σ_t round( idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
                          · 1e6 )                    [bigint micros]
    idf(t)   = ln( (N − df + 0.5) / (df + 0.5) + 1 )

    Ties broken by ascending doc id (total order). Output:
    (id_col, score_micro, rank), rank 1..top_k.
    """
    from .dedup import normalized_text_col

    terms = sorted(set(query_terms))
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    base = df.select(
        F.col(id_col).alias("_id"),
        F.split(normalized_text_col(F.col(text_col)), " ").alias("_t"),
    )
    # doc length BEFORE the explode so it isn't re-evaluated per token
    sized = base.select(
        "_id", F.size(F.filter("_t", lambda x: x != "")).alias("_dl"), "_t"
    )
    toks = sized.select(
        "_id", "_dl", F.explode("_t").alias("_w")
    ).where(F.col("_w").isin(terms))
    tf = toks.groupBy("_id", "_dl", "_w").agg(F.count("*").alias("_tf"))

    corpus = base.select(
        F.count("*").alias("_N"),
        F.sum(F.size(F.filter("_t", lambda x: x != ""))).alias("_sum_dl"),
    )
    dfreq = tf.groupBy("_w").agg(F.count("*").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(corpus)).select(
        "_w",
        F.expr(
            "ln((_N - _df + 0.5) / (_df + 0.5) + 1)"
        ).alias("_idf"),
        F.expr("_sum_dl / _N").alias("_avgdl"),
    )
    scored = tf.join(F.broadcast(idf), "_w").select(
        "_id",
        F.expr(
            f"CAST(round(_idf * _tf * CAST('{k1p1!r}' AS DOUBLE) / "
            f"(_tf + CAST('{k1!r}' AS DOUBLE) * (CAST('{one_minus_b!r}' AS DOUBLE) "
            f"+ CAST('{b!r}' AS DOUBLE) * _dl / _avgdl)) "
            f"* 1e6) AS BIGINT)"
        ).alias("_s"),
    )
    docs = scored.groupBy("_id").agg(F.sum("_s").alias("score_micro"))
    top = docs.orderBy(F.col("score_micro").desc(), F.col("_id").asc()).limit(top_k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("_id").asc())
    return top.select(
        F.col("_id").alias(id_col),
        F.col("score_micro").cast("long"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    top_k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of N ranked
    lists — the standard way to combine a lexical (BM25) and a vector
    (cosine ANN) ranker into one hybrid retrieval result without score
    calibration.

    score(d) = Σ_r round(1e6 / (rrf_k + rank_r(d)))   [bigint micros]

    Each per-ranker term is micro-rounded BEFORE the sum, so the fused
    score is an order-independent integer sum (the q66 discipline);
    documents absent from a ranker simply contribute nothing. The merge
    is a union + one groupBy on id — no join fan-out, N lists of k rows
    cost O(N·k) regardless of corpus size.

    Output: (id_col, rrf_micro, n_rankers, rank), rank 1..top_k by
    (rrf_micro desc, id asc).
    """
    parts = [
        r.select(
            F.col(id_col).alias("_id"),
            F.expr(f"CAST(round(1e6 / ({rrf_k} + {rank_col})) AS BIGINT)").alias(
                "_c"
            ),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionAll(p)
    fused = allr.groupBy("_id").agg(
        F.sum("_c").alias("rrf_micro"), F.count("*").alias("n_rankers")
    )
    top = fused.orderBy(F.col("rrf_micro").desc(), F.col("_id").asc()).limit(top_k)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("_id").asc())
    return top.select(
        F.col("_id").alias(id_col),
        F.col("rrf_micro").cast("long"),
        F.col("n_rankers").cast("long"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document — keyword extraction for KG node
    descriptions. idf = ln(N/df) computed ONCE per distinct term from
    integer counts (q66 discipline) and broadcast back; the per-(doc,
    term) score is micro-rounded tf·idf; per-doc rank is a window with
    the total order (score desc, term asc).

    Output: (id_col, term, score_micro, rank), rank 1..top_k.
    """
    from .dedup import normalized_text_col

    base = df.select(
        F.col(id_col).alias("_id"),
        F.split(normalized_text_col(F.col(text_col)), " ").alias("_t"),
    )
    toks = base.select("_id", F.explode("_t").alias("_w")).where(F.col("_w") != "")
    tf = toks.groupBy("_id", "_w").agg(F.count("*").alias("_tf"))
    n_docs = base.select(F.count("*").alias("_N"))
    dfreq = tf.groupBy("_w").agg(F.count("*").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "_w", F.expr("ln(CAST(_N AS DOUBLE) / _df)").alias("_idf")
    )
    scored = tf.join(F.broadcast(idf), "_w").select(
        "_id",
        "_w",
        F.expr("CAST(round(_tf * _idf * 1e6) AS BIGINT)").alias("score_micro"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score_micro").desc(), F.col("_w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("term"),
            "score_micro",
            F.col("rank").cast("long"),
        )
    )


def mmr_rerank(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Per-group Maximal-Marginal-Relevance re-ranking (Carbonell &
    Goldstein 1998): greedily pick k items maximizing
    λ·rel − (1−λ)·max-sim-to-picked — the diversity-aware final stage
    every retrieval pipeline wants and Spark lacks.  Runs for ALL query
    groups simultaneously as pure relational rounds (each pick is a
    per-group window argmax; no driver loop, no Python) — the
    distributed shape for "re-rank a million retrievals", not one.

    Per group: the query is the md5-min member (deterministic stand-in
    for an external query vector — swap in a real query table by
    pre-joining and adapting the `q` stage); candidates are the other
    members; rel and the diversity penalty are integer micro-dot
    products; score = lam_num·rel − (lam_den−lam_num)·max_sim keeps
    everything bigint (λ = lam_num/lam_den, default 0.7), ties broken
    on id.  Round r joins candidates against the (r−1)-row-per-group
    picked set — each round's plan references the previous round twice
    (argmax + exclusion), so keep k small (≤5; plan size doubles per
    round — the documented unrolled-loop trade, same as the kmeans
    oracle) or pin rounds for large k.

    Output per (group, pick_rank 1..k): id, rel (raw integer micro²
    dot), score (same scale ×lam_den).
    """
    from .clustering import micro_vectors

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    mem = df.select(
        F.col(group_col).alias("g"), F.col(id_col).alias("id"), F.col(vec_col)
    )
    vecs = micro_vectors(mem, "id", vec_col).join(
        mem.select("g", "id"), "id"
    )
    wq = Window.partitionBy("g").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    q = (
        vecs.select("g", "id", "ev", F.row_number().over(wq).alias("_rn"))
        .where(F.col("_rn") == 1)
        .select("g", F.col("id").alias("qid"), F.col("ev").alias("qv"))
    )
    rel = (
        vecs.join(q, "g")
        .where(F.col("id") != F.col("qid"))
        .select("g", "id", "ev", dot(F.col("ev"), F.col("qv")).alias("rel"))
    )
    mu = F.lit(int(lam_num)).cast("long")
    pen = F.lit(int(lam_den - lam_num)).cast("long")
    wpick = Window.partitionBy("g").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    picked = None
    out = []
    for r in range(1, k + 1):
        if picked is None:
            scored = rel.select("g", "id", "ev", "rel", (mu * F.col("rel")).alias("score"))
        else:
            pk = picked.select(
                "g", F.col("id").alias("pid"), F.col("ev").alias("pv")
            )
            # exclusion + max-sim in one pass: join candidates to every
            # picked row of their group; the max dot skips the self
            # pairing, and a candidate that IS picked flags _self.
            ms = (
                rel.join(pk, "g")
                .groupBy("g", "id", "ev", "rel")
                .agg(
                    F.max(
                        F.when(
                            F.col("id") != F.col("pid"),
                            dot(F.col("ev"), F.col("pv")),
                        )
                    ).alias("ms"),
                    F.max((F.col("id") == F.col("pid")).cast("int")).alias(
                        "_self"
                    ),
                )
            )
            scored = ms.where(F.col("_self") == 0).select(
                "g", "id", "ev", "rel",
                (mu * F.col("rel") - pen * F.col("ms")).alias("score"),
            )
        pick_r = (
            scored.select(
                "g", "id", "ev", "rel", "score",
                F.row_number().over(wpick).alias("_rn"),
            )
            .where(F.col("_rn") == 1)
            .select("g", "id", "ev", "rel", "score")
        )
        out.append(
            pick_r.select(
                "g", F.lit(r).cast("long").alias("pick_rank"), "id", "rel",
                "score",
            )
        )
        picked = pick_r if picked is None else picked.unionByName(pick_r)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.select(
        F.col("g").alias(group_col),
        "pick_rank",
        F.col("id").alias(id_col),
        F.col("rel").cast("long"),
        F.col("score").cast("long"),
    )


def ql_dirichlet_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mu: int = 2000,
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents by Dirichlet-smoothed query-likelihood (Zhai &
    Lafferty 2004) — the language-model retrieval family next to
    `bm25_topk`'s probabilistic one; the two disagree exactly where a
    hybrid (q86 RRF) earns its keep.

    score(d) = Σ_t ln( (tf_td + μ·p_c(t)) / (dl_d + μ) ),
    p_c(t) = cf_t / TOT.  Clearing denominators, each term is
    ln( (tf·TOT + μ·cf) / (TOT·(dl + μ)) ) — ONE division of two int64
    products, micro-rounded per (doc, term) (the qa66 ln idiom), then
    an exact integer sum.  Terms absent from the corpus (cf = 0) drop
    out in BOTH engines (ln 0 undefined — the standard convention).
    Every document scores, including tf = 0 everywhere (pure length
    smoothing): the doc × term grid is docs × |query| rows — queries
    are small by contract, so the grid is a broadcast fan-out, never a
    blow-up.

    Output: (id_col, score_micro, rank 1..top_k), ties broken by id.
    """
    from .dedup import normalized_text_col

    terms = sorted(set(query_terms))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(normalized_text_col(F.col(text_col)), " "),
            lambda x: x != "",
        ).alias("_t"),
    ).select("_id", F.size("_t").alias("_dl"), "_t")
    tok = base.select("_id", F.explode("_t").alias("_w")).where(
        F.col("_w").isin(terms)
    )
    tf = tok.groupBy("_id", "_w").agg(F.count("*").cast("long").alias("_tf"))
    cf = tf.groupBy("_w").agg(F.sum("_tf").cast("long").alias("_cf"))
    tot = base.agg(F.sum("_dl").cast("long").alias("_tot"))
    grid = (
        base.select("_id", "_dl")
        .crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(tot))
        .join(tf, ["_id", "_w"], "left")
        .select(
            "_id",
            "_dl",
            "_w",
            "_cf",
            "_tot",
            F.coalesce("_tf", F.lit(0)).cast("long").alias("_tf"),
        )
    )
    term_micro = F.round(
        F.lit(1_000_000.0)
        * F.log(
            (F.col("_tf") * F.col("_tot") + F.lit(int(mu)) * F.col("_cf"))
            .cast("double")
            / (F.col("_tot") * (F.col("_dl") + F.lit(int(mu))))
        )
    ).cast("long")
    scored = grid.groupBy("_id").agg(
        F.sum(term_micro).cast("long").alias("score_micro")
    )
    # orderBy().limit() plans as TakeOrderedAndProject (per-partition
    # top-n, never a global sort); the rank window then runs on the
    # top_k survivors only.
    w = Window.orderBy(F.col("score_micro").desc(), F.col("_id"))
    return (
        scored.orderBy(F.col("score_micro").desc(), F.col("_id"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(F.col("_id").alias(id_col), "score_micro", "rank")
    )
