"""Wave-49 operators: TOST equivalence, linear CKA, Brown-Forsythe."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.similarity import linear_cka
from ontology_mapper_spark.operators.stats import (
    brown_forsythe,
    tost_equivalence,
)


def test_tost_identical_arms_equivalent(spark):
    rows = [(i % 2 == 0, i % 5 == 0) for i in range(2000)]
    df = spark.createDataFrame(rows, "arm boolean, y boolean")
    r = tost_equivalence(df, "arm", "y", margin_micro=50_000).collect()[0]
    assert r["d_micro"] == 0
    assert r["equivalent"] is True
    assert r["z_lower_milli"] == r["z_upper_milli"]


def test_tost_large_difference_not_equivalent(spark):
    rows = [(True, i < 60) for i in range(100)]
    rows += [(False, i < 20) for i in range(100)]
    df = spark.createDataFrame(rows, "arm boolean, y boolean")
    r = tost_equivalence(df, "arm", "y", margin_micro=50_000).collect()[0]
    assert r["d_micro"] == 400_000
    assert r["equivalent"] is False
    assert r["z_upper_milli"] < 0  # (delta - d) < 0: clearly worse


def test_tost_underpowered_is_not_equivalent(spark):
    # tiny n: same rates but se too wide to prove equivalence
    rows = [(True, i < 2) for i in range(4)] + [(False, i < 2) for i in range(4)]
    df = spark.createDataFrame(rows, "arm boolean, y boolean")
    r = tost_equivalence(df, "arm", "y", margin_micro=50_000).collect()[0]
    assert r["d_micro"] == 0 and r["equivalent"] is False


def _vecs(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_cka_identity_is_one(spark):
    df = _vecs(spark, [[1, 2, 3, 4], [4, 3, 2, 1], [0, 1, 0, 2],
                       [2, 2, 1, 1], [5, 0, 1, 3]])
    df = df.select("vec_id", "embedding",
                   F.col("embedding").alias("embedding_b"))
    r = linear_cka(df, "vec_id", "embedding", "embedding_b").collect()[0]
    assert r["cka_micro"] == 1_000_000
    assert r["d_a"] == 4 and r["d_b"] == 4


def test_cka_orthogonal_views_near_zero(spark):
    # X varies only in dims 0-1, Y (slice of dims 2-3) independent-ish:
    # construct so dims 0,1 are uncorrelated with dims 2,3
    rows = [
        [1, 0, 0, 0], [-1, 0, 0, 0], [0, 1, 0, 0], [0, -1, 0, 0],
        [0, 0, 1, 0], [0, 0, -1, 0], [0, 0, 0, 1], [0, 0, 0, -1],
    ]
    df = _vecs(spark, rows).select(
        "vec_id",
        F.slice("embedding", 1, 2).alias("embedding"),
        F.slice("embedding", 3, 2).alias("embedding_b"),
    )
    r = linear_cka(df, "vec_id", "embedding", "embedding_b").collect()[0]
    assert r["cka_micro"] < 100_000


def test_cka_scale_invariant(spark):
    base = [[1, 2, 3, 4], [4, 3, 2, 1], [0, 1, 0, 2], [2, 2, 1, 1]]
    a = _vecs(spark, base)
    scaled = a.select(
        "vec_id",
        "embedding",
        F.transform("embedding", lambda x: x * 3.0).alias("embedding_b"),
    )
    r = linear_cka(scaled, "vec_id", "embedding", "embedding_b").collect()[0]
    # CKA is invariant to isotropic scaling (up to micro/kilo rounding)
    assert r["cka_micro"] >= 999_000


def test_brown_forsythe_spread_difference(spark):
    # group a tight around 100, group b spread wide: F large
    rows = [("a", v) for v in (99, 100, 100, 101) * 5]
    rows += [("b", v) for v in (0, 50, 150, 200) * 5]
    df = spark.createDataFrame(rows, "g string, v long")
    out = brown_forsythe(df, "g", "v").collect()
    by = {r["g"]: r for r in out}
    assert by["a"]["median"] == 100
    assert by["a"]["mean_absdev_milli"] < by["b"]["mean_absdev_milli"]
    assert out[0]["f_milli"] > 10_000  # wildly significant


def test_brown_forsythe_equal_spread_small_f(spark):
    rows = [("a", v) for v in (0, 10, 20, 30) * 5]
    rows += [("b", v + 1000) for v in (0, 10, 20, 30) * 5]
    df = spark.createDataFrame(rows, "g string, v long")
    r = brown_forsythe(df, "g", "v").collect()[0]
    # pure location shift: identical deviations -> F == 0
    assert r["f_milli"] == 0
