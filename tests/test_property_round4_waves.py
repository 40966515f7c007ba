"""Hypothesis property tests for the round-4 query-wave operators:
bounds and conservation laws that unit cases can't cover — the sketch
error bound, entropy bounds, decayed-share conservation, correlation
range, and the attribution credit-conservation law.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 5_000), min_size=1, max_size=60),
    st.sampled_from([16, 128, 1024]),
)
def test_binned_quantile_sketch_error_bound(spark, values, width):
    """sketch >= exact and err < bin_width, for every quantile."""
    from ontology_mapper_spark.operators.sketch import binned_quantile_audit

    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v long"
    )
    out = binned_quantile_audit(
        df, "g", "v", quantiles=(50, 90, 99), bin_width=width
    ).collect()
    assert len(out) == 3
    svals = sorted(values)
    for r in out:
        assert 0 <= r["err"] < width
        # exact is the type-1 quantile: rank ceil(q*n/100), 1-based
        rank = (r["q_pct"] * len(values) + 99) // 100
        assert r["exact_value"] == svals[rank - 1]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=24),
        min_size=1,
        max_size=10,
    )
)
def test_char_entropy_bounds(spark, texts):
    """0 <= H <= ln(n_chars) per doc, so the group average obeys the
    corpus-max-length bound; uniform-char docs sit at exactly 0."""
    from ontology_mapper_spark.operators.textstats import (
        char_entropy_report,
    )

    df = spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    r = char_entropy_report(df, "text", "source", "doc_id").collect()[0]
    max_ln = round(math.log(max(len(t) for t in texts)) * 1e6)
    assert 0 <= r["avg_entropy_micro"] <= max_ln
    assert r["n_docs"] == len(texts)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
    )
)
def test_decayed_shares_conserve(spark, rows):
    """share_micro sums to 1e6 within per-key rounding slack, and the
    decayed value never exceeds the raw count."""
    from ontology_mapper_spark.operators.temporal import (
        half_life_decayed_counts,
    )

    df = spark.createDataFrame(
        [
            (i, f"2024-01-{1 + (d % 28):02d} 10:00:00", k)
            for i, (d, k) in enumerate(rows)
        ],
        "event_id long, ts string, k string",
    )
    out = half_life_decayed_counts(df, "ts", "k").collect()
    total = sum(r["share_micro"] for r in out)
    assert abs(total - 1_000_000) <= len(out)  # per-key rounding
    for r in out:
        assert r["decayed_milli"] <= r["n_total"] * 1000
        assert r["decayed_milli"] >= 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=2,
        max_size=40,
    )
)
def test_assortativity_in_range(spark, edges):
    """Pearson correlation is in [-1, 1] => micro in [-1e6, 1e6]."""
    from ontology_mapper_spark.operators.graph import degree_assortativity

    df = spark.createDataFrame(
        [(f"s{a}", f"d{b}") for a, b in edges], "s string, d string"
    )
    r = degree_assortativity(df, "s", "d").collect()[0]
    if r["assortativity_micro"] is not None:
        assert -1_000_000 <= r["assortativity_micro"] <= 1_000_000


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 8),          # user
            st.integers(0, 5),          # minute offset
            st.sampled_from(["click", "view", "purchase"]),
            st.integers(1, 500),        # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_linear_attribution_conserves_credit(spark, rows):
    """Every conversion distributes exactly 1e6 micro credit, whether
    to touches or to the 'none' bucket."""
    from ontology_mapper_spark.operators.temporal import linear_attribution

    df = spark.createDataFrame(
        [
            (i, f"2024-01-01 10:{m:02d}:00", u, t, c / 100.0)
            for i, (u, m, t, c) in enumerate(rows)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    )
    out = linear_attribution(
        df, "ts", "user_id", "event_type", "value", "event_id"
    ).collect()
    n_conv = sum(1 for _, _, t, _ in rows if t == "purchase")
    assert sum(r["credit_micro"] for r in out) == n_conv * 1_000_000
