"""Wave-53 operators: chi-square cell residuals, Cramér-von Mises."""

from __future__ import annotations

from ontology_mapper_spark.operators.stats import (
    chi2_cell_residuals,
    cramer_von_mises,
)


def test_chi2_residuals_independent_table(spark):
    # perfectly independent 2x2: residuals 0, chi2 0
    rows = [("a", "x")] * 20 + [("a", "y")] * 20 + [("b", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r0 string, c0 string")
    out = chi2_cell_residuals(df, "r0", "c0").collect()
    assert out[0]["chi2_milli"] == 0 and out[0]["df_chi"] == 1
    assert all(r["std_residual_milli"] == 0 for r in out)
    by = {(r["r0"], r["c0"]): r for r in out}
    assert by[("a", "x")]["expected_milli"] == 20_000


def test_chi2_residuals_flags_driving_cell(spark):
    # 'b' strongly prefers 'y'
    rows = [("a", "x")] * 25 + [("a", "y")] * 25 + [("b", "x")] * 5 + [("b", "y")] * 45
    df = spark.createDataFrame(rows, "r0 string, c0 string")
    by = {(r["r0"], r["c0"]): r for r in chi2_cell_residuals(df, "r0", "c0").collect()}
    assert by[("b", "y")]["std_residual_milli"] > 3000
    assert by[("b", "x")]["std_residual_milli"] < -3000
    # adjusted residuals are antisymmetric in a 2x2
    assert abs(by[("a", "x")]["std_residual_milli"] + by[("b", "x")]["std_residual_milli"]) <= 1
    assert by[("a", "x")]["chi2_milli"] > 10_000


def test_cvm_identical_zero(spark):
    rows = [(v, s) for v in range(10) for s in (True, False)]
    df = spark.createDataFrame(rows, "v long, b boolean")
    r = cramer_von_mises(df, "v", "b").collect()[0]
    assert r["t_micro"] == 0


def test_cvm_disjoint_hand(spark):
    # A = {1,2}, B = {11,12}: F gaps are 0.5, 1, 1, (1 then both hit 1)
    rows = [(1, False), (2, False), (11, True), (12, True)]
    df = spark.createDataFrame(rows, "v long, b boolean")
    r = cramer_von_mises(df, "v", "b").collect()[0]
    # gaps at pooled values: .5, 1, .5, 0 each weight 1
    # T = (4/16) * (0.25 + 1 + 0.25 + 0)/4 = 0.09375
    assert r["t_micro"] == 93_750
    assert r["n_values"] == 4


def test_cvm_orders_by_separation(spark):
    near = [(v, False) for v in range(10)] + [(v + 1, True) for v in range(10)]
    far = [(v, False) for v in range(10)] + [(v + 8, True) for v in range(10)]
    tn = cramer_von_mises(
        spark.createDataFrame(near, "v long, b boolean"), "v", "b"
    ).collect()[0]["t_micro"]
    tf = cramer_von_mises(
        spark.createDataFrame(far, "v long, b boolean"), "v", "b"
    ).collect()[0]["t_micro"]
    assert tf > tn > 0
