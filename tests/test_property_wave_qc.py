"""Hypothesis property tests for the qc* waves: rank-test invariances,
attribution conservation, Qini/Brier identities, MATTR bounds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 20)),
        min_size=6,
        max_size=60,
    ).filter(lambda rs: len({g for g, _ in rs}) == 3)
)
def test_kruskal_wallis_monotone_invariant(spark, rows):
    """H is rank-based: applying a strictly monotone map (x -> 3x + 7)
    to every value leaves h_milli unchanged."""
    from ontology_mapper_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(rows, "g string, v long")
    df2 = spark.createDataFrame(
        [(g, 3 * v + 7) for g, v in rows], "g string, v long"
    )
    h1 = kruskal_wallis(df, "g", "v").collect()[0]
    h2 = kruskal_wallis(df2, "g", "v").collect()[0]
    assert h1["h_milli"] == h2["h_milli"]
    assert h1["h_tie_milli"] == h2["h_tie_milli"]
    # raw H is non-negative up to per-group micro rounding
    assert h1["h_milli"] >= -1


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 15)),
        min_size=6,
        max_size=40,
    ).filter(lambda rs: len({g for g, _ in rs}) == 3)
)
def test_jonckheere_reversal_antisymmetry(spark, rows):
    """Reversing the group ORDER flips the trend: JT2 + JT2_rev =
    2*E2 (pairwise totals), z flips sign (within milli rounding)."""
    from ontology_mapper_spark.operators.stats import jonckheere_terpstra

    df = spark.createDataFrame(rows, "g string, v long")
    f = jonckheere_terpstra(df, "g", "v", ("a", "b", "c")).collect()[0]
    r = jonckheere_terpstra(df, "g", "v", ("c", "b", "a")).collect()[0]
    assert f["jt2"] + r["jt2"] == 2 * f["e2"]
    if f["z_milli"] is not None and r["z_milli"] is not None:
        assert abs(f["z_milli"] + r["z_milli"]) <= 1


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),  # n touches in journey
            st.integers(1, 50),  # cents
        ),
        min_size=1,
        max_size=10,
    )
)
def test_position_attribution_conservation(spark, journeys):
    """Total credit over all buckets == 1e6 per conversion, exactly,
    for any journey-size mix."""
    import datetime as dt

    from ontology_mapper_spark.operators.temporal import (
        position_based_attribution,
    )

    rows, eid = [], 0
    for u, (n, cents) in enumerate(journeys):
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 0, 0, eid % 60, eid // 60),
                 u, ["click", "view", "signup"][i % 3], 0.0)
            )
            eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, 1, 0, 0, eid % 60, eid // 60),
             u, "purchase", float(cents) / 100)
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = position_based_attribution(df).collect()
    assert sum(r["credit_micro"] for r in out) == 1_000_000 * len(journeys)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.booleans(), st.booleans()),
        min_size=4,
        max_size=60,
    ).filter(lambda rs: any(t for _, t, _ in rs) and any(not t for _, t, _ in rs))
)
def test_qini_final_point_matches_totals(spark, rows):
    """The curve's last point equals the corpus totals, and rand2 =
    N_t * final uplift (the diagonal endpoint)."""
    from ontology_mapper_spark.operators.evaluate import qini_curve

    df = spark.createDataFrame(rows, "s long, tr boolean, y boolean")
    out = qini_curve(df, "s", "tr", "y").collect()
    last = min(out, key=lambda r: r["s"])
    nt = sum(1 for _, t, _ in rows if t)
    assert last["cum_n_t"] == nt
    assert last["cum_y_t"] == sum(1 for _, t, y in rows if t and y)
    assert out[0]["rand2_milli"] == nt * last["uplift_milli"]


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 99), st.booleans()), min_size=10, max_size=80))
def test_brier_murphy_identity_and_range(spark, rows):
    from ontology_mapper_spark.operators.evaluate import brier_decomposition

    df = spark.createDataFrame(rows, "s long, y boolean")
    g = brier_decomposition(df, "s", "y", n_bins=10).collect()[0]
    assert 0 <= g["brier_micro"] <= 1_000_000
    assert 0 <= g["unc_micro"] <= 250_000
    # Murphy identity within micro-rounding of acc/obar (3 roundings)
    assert abs(
        g["brier_micro"] - (g["rel_micro"] - g["res_micro"] + g["unc_micro"])
    ) <= 5


@settings(**_SETTINGS)
@given(st.text(alphabet="ab ", min_size=1, max_size=120))
def test_mattr_bounds_and_constant_floor(spark, text):
    from ontology_mapper_spark.operators.textstats import mattr

    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = mattr(df, "doc_id", "text", 5).collect()[0]
    assert r["n_tokens"] == len(toks)
    w = min(5, len(toks))
    # MATTR in [1/w, 1]
    assert 1_000_000 // w - 1 <= r["mattr_micro"] <= 1_000_000
