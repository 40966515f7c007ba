"""Wave-56 operators: recommendation coverage, calibration slope."""

from __future__ import annotations

from ontology_mapper_spark.operators.evaluate import calibration_slope
from ontology_mapper_spark.operators.similarity import (
    recommendation_coverage,
)


def _topk(spark, rows):
    return spark.createDataFrame(rows, "query_id long, vec_id long")


def _corpus(spark, n):
    return spark.createDataFrame(
        [(i,) for i in range(n)], "vec_id long"
    )


def test_coverage_all_same_item(spark):
    topk = _topk(spark, [(q, 7) for q in range(5)])
    r = recommendation_coverage(topk, _corpus(spark, 100)).collect()[0]
    assert r["n_recommended"] == 1
    assert r["coverage_micro"] == 10_000      # 1/100
    assert r["rec_hhi_micro"] == 1_000_000    # total concentration
    assert r["novelty_micro"] == 0            # ln(5/5) = 0


def test_coverage_all_distinct(spark):
    topk = _topk(spark, [(q, q) for q in range(10)])
    r = recommendation_coverage(topk, _corpus(spark, 20)).collect()[0]
    assert r["n_recommended"] == 10
    assert r["coverage_micro"] == 500_000
    assert r["rec_hhi_micro"] == 100_000      # 10 slots, each 1/10
    # novelty = ln(10) = 2.302585
    assert abs(r["novelty_micro"] - 2_302_585) <= 10


def test_calibration_slope_perfect(spark):
    # bin b rate equals its midpoint -> slope 1, intercept 0
    rows = []
    for b in range(10):
        npos = round((2 * b + 1) / 20 * 40)
        rows += [(b * 10 + 5, i < npos) for i in range(40)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    r = calibration_slope(df, "s", "y", n_bins=10).collect()[0]
    assert abs(r["slope_milli"] - 1000) <= 10
    assert abs(r["intercept_micro"]) <= 6_000
    assert abs(r["large_gap_micro"]) <= 2_000


def test_calibration_slope_flat_outcome_zero_slope(spark):
    # outcome independent of score: slope ~ 0, intercept ~ base rate
    rows = [(s, s % 2 == 0) for s in range(100)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    r = calibration_slope(df, "s", "y", n_bins=10).collect()[0]
    assert abs(r["slope_milli"]) <= 20
    assert abs(r["intercept_micro"] - 500_000) <= 12_000
    # mean conf = 0.5 too: in-the-large gap ~ 0
    assert abs(r["large_gap_micro"]) <= 2_000
