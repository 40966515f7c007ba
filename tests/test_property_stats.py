"""Hypothesis property tests for the round-3 statistical operators:
invariants that closed-form unit cases can't cover (arbitrary data,
monotone-transform invariance, bounds, budget conservation)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ontology_mapper_spark.operators.split import neyman_allocation
from ontology_mapper_spark.operators.stats import (
    kaplan_meier,
    spearman_rho,
    weighted_median,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.booleans()),
        min_size=4,
        max_size=24,
    )
)
def test_auc_invariant_under_monotone_score_transform(spark, rows):
    from ontology_mapper_spark.operators.evaluate import roc_auc

    df = spark.createDataFrame(
        [("g", s, y) for s, y in rows], "g string, v bigint, y boolean"
    )
    base = roc_auc(df, "g", "v", "y").collect()[0]
    # strictly increasing affine transform preserves all rank statistics
    from pyspark.sql import functions as F

    t = roc_auc(df, "g", F.col("v") * 7 + 3, "y").collect()[0]
    assert base["auc_micro"] == t["auc_micro"]
    assert base["u2"] == t["u2"]
    if base["auc_micro"] is not None:
        assert 0 <= base["auc_micro"] <= 1_000_000


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
        min_size=2,
        max_size=20,
    )
)
def test_spearman_bounds_and_monotone_invariance(spark, pairs):
    rows = [("g", x, y, i) for i, (x, y) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint, id bigint")
    base = spearman_rho(df, "g", "x", "y", "id").collect()[0]
    assert -1_000_000 <= base["rho_micro"] <= 1_000_000
    from pyspark.sql import functions as F

    t = spearman_rho(
        df.select("g", (F.col("x") * 5 + 1).alias("x"), "y", "id"),
        "g", "x", "y", "id",
    ).collect()[0]
    assert base["rho_micro"] == t["rho_micro"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.booleans()),
        min_size=1,
        max_size=24,
    ).filter(lambda rs: any(e for _, e in rs))
)
def test_kaplan_meier_survival_monotone_in_unit_interval(spark, rows):
    df = spark.createDataFrame(rows, "t bigint, e boolean")
    out = sorted(
        kaplan_meier(df, "t", "e").collect(), key=lambda r: r["duration"]
    )
    prev = 1_000_000
    for r in out:
        assert 0 <= r["survival_micro"] <= 1_000_000
        # non-increasing (allow 1 micro of ln/exp rounding slack)
        assert r["survival_micro"] <= prev + 1
        prev = r["survival_micro"]
        assert r["n_events"] >= 1
        assert r["n_at_risk"] >= r["n_events"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(0, 1000)),
        min_size=2,
        max_size=30,
    )
)
def test_neyman_allocation_conserves_budget(spark, rows):
    df = spark.createDataFrame(rows, "h string, v bigint")
    out = neyman_allocation(df, "h", "v", 10_000).collect()
    total_w = sum(r["weight_micro"] for r in out)
    alloc = sum(r["alloc_n"] for r in out)
    if total_w == 0:
        assert alloc == 0  # all-constant strata: nothing allocatable
    else:
        # independent rounding drifts at most half a unit per stratum
        assert abs(alloc - 10_000) <= len(out)
    for r in out:
        assert r["alloc_n"] >= 0 and r["var_micro"] >= 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(1, 500), st.integers(1, 50)),
        min_size=1,
        max_size=25,
    )
)
def test_weighted_median_within_value_range(spark, rows):
    df = spark.createDataFrame(
        [("g", v, w, i) for i, (v, w) in enumerate(rows)],
        "g string, v bigint, w bigint, tb bigint",
    )
    out = weighted_median(df, "g", "v", "w", "tb").collect()[0]
    vals = [v for v, _ in rows]
    assert min(vals) <= out["p50_weighted"] <= max(vals)
    assert min(vals) <= out["p50_plain"] <= max(vals)
    assert out["w_total"] == sum(w for _, w in rows)
