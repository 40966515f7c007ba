"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against the full corpus, dot products as native `aggregate`/`zip_with`
Column expressions (JVM-side, no Python). Scale path: LSH bucketing via
random-hyperplane signs (deterministic hyperplanes derived from xxhash64 of
(dim, plane) — no RNG state), candidates only within matching buckets.

At 100 TB the corpus side stays partitioned and is scanned once; only
queries are broadcast. For corpus×corpus near-dup the LSH variant bounds
the join to bucket-mates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_cols(a, b):
    """Cosine similarity of two array<numeric> Columns (native expressions)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k corpus neighbors per query by cosine. The query side is
    broadcast (it is the small side by contract); ranking is a window over
    query_id with a deterministic tiebreak on corpus id."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        cosine_cols(
            F.col(vec_col).cast("array<double>"), F.col("_qvec").cast("array<double>")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplane_sign(vec, plane_id: int, dim: int):
    """Sign of <v, h_plane> with pseudo-random ±1 hyperplane components
    derived from xxhash64(plane, dim_index) — fully deterministic."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.pmod(F.xxhash64(F.lit(plane_id), i), F.lit(2)) == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0)),
    )
    return (_dot(vec.cast("array<double>"), comps) > 0).cast("int")


def lsh_bucket_col(vec, dim: int, n_planes: int = 8):
    """Random-hyperplane LSH bucket id (int in [0, 2^n_planes))."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p, dim)
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat approximate top-k.

    Coarse quantizer: `n_centroids` centroids picked DETERMINISTICALLY as
    the corpus vectors with the smallest xxhash64(id) (a seeded random
    sample without RNG state — reproducible under any partitioning).
    Corpus vectors are assigned to their nearest centroid (inverted
    lists); each query probes its `nprobe` nearest lists only. At corpus
    scale the scored set shrinks by ~n_centroids/nprobe versus
    brute-force while the centroid table stays broadcast-sized.
    """
    # stable centroid ids: rank by the hash that selected them
    cent = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy("_h"))
            .alias("centroid_id"),
            F.col(vec_col).alias("_cvec"),
        )
    )
    cent_b = F.broadcast(cent)

    def nearest(df: DataFrame, key: str, vec: str, n: int, out: str) -> DataFrame:
        scored = df.crossJoin(cent_b).withColumn(
            "_csim",
            cosine_cols(
                F.col(vec).cast("array<double>"), F.col("_cvec").cast("array<double>")
            ),
        )
        w = Window.partitionBy(key).orderBy(
            F.col("_csim").desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= n)
            .select(*df.columns, F.col("centroid_id").alias(out))
        )

    assigned = nearest(corpus.select(id_col, vec_col), id_col, vec_col, 1, "list_id")
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    probes = nearest(q, query_id_col, "_qvec", nprobe, "list_id")

    joined = assigned.join(F.broadcast(probes), "list_id").withColumn(
        "cosine",
        cosine_cols(
            F.col(vec_col).cast("array<double>"), F.col("_qvec").cast("array<double>")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
        .dropDuplicates([query_id_col, id_col])
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: cosine ranking restricted to LSH bucket-mates.

    Equi-join on bucket id replaces the cross join — at corpus scale this
    is the difference between O(N·Q) and O(N·Q/2^planes). Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher recall).
    """
    cb = corpus.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes))
    qb = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_bucket", lsh_bucket_col(F.col("_qvec"), dim, n_planes))
    joined = cb.join(F.broadcast(qb), "_bucket").withColumn(
        "cosine",
        cosine_cols(
            F.col(vec_col).cast("array<double>"), F.col("_qvec").cast("array<double>")
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
