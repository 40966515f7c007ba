"""Wave-61 tests: Misra-Gries two-pass heavy hitters are exact and
partition-invariant; Stuart-Maxwell identities."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ontology_mapper_spark.operators.sketch import misra_gries_heavy_hitters
from ontology_mapper_spark.operators.stats import stuart_maxwell


def _zipf_tokens(seed: int, n: int):
    rng = np.random.default_rng(seed)
    # zipf-ish over 2000 values: a few values far above n/k, most rare
    ranks = rng.zipf(1.3, n).clip(1, 2000)
    return [f"tok{r}" for r in ranks]


def test_mg_matches_exact_and_partition_invariant(spark):
    toks = _zipf_tokens(11, 20_000)
    df = spark.createDataFrame([(t,) for t in toks], "value string")
    k = 50
    exact = {
        r["value"]: r["freq"]
        for r in df.groupBy("value")
        .agg(F.count("*").cast("long").alias("freq"))
        .crossJoin(df.agg(F.count("*").alias("nt")))
        .where(F.col("freq") * k > F.col("nt"))
        .collect()
    }
    assert exact, "fixture must produce at least one heavy hitter"
    for parts in (2, 7, 31):
        got = {
            r["value"]: r["freq"]
            for r in misra_gries_heavy_hitters(
                df.repartition(parts), "value", k=k
            ).collect()
        }
        assert got == exact


def test_mg_share_sums_below_one(spark):
    toks = _zipf_tokens(3, 5_000)
    df = spark.createDataFrame([(t,) for t in toks], "value string")
    rows = misra_gries_heavy_hitters(df, "value", k=20).collect()
    assert sum(r["share_micro"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["freq"] * 20 > 5_000


def test_stuart_maxwell_symmetric_is_zero(spark):
    # perfectly symmetric disagreements -> equal margins -> chi2 = 0
    rows = (
        [(0, 1)] * 10 + [(1, 0)] * 10 + [(1, 2)] * 7 + [(2, 1)] * 7
        + [(0, 0)] * 5 + [(2, 2)] * 4
    )
    df = spark.createDataFrame(rows, "p long, q long")
    r = stuart_maxwell(df, "p", "q").collect()[0]
    assert r["d0"] == 0 and r["d1"] == 0
    assert r["chi2_milli"] == 0


def test_stuart_maxwell_shift_detects(spark):
    # mass moves 0 -> 2: d0 positive, large chi2
    rows = (
        [(0, 2)] * 30 + [(0, 0)] * 10 + [(1, 1)] * 10 + [(2, 2)] * 10
        + [(1, 2)] * 5
    )
    df = spark.createDataFrame(rows, "p long, q long")
    r = stuart_maxwell(df, "p", "q").collect()[0]
    assert r["d0"] == 30
    assert r["chi2_milli"] is not None and r["chi2_milli"] > 10_000
