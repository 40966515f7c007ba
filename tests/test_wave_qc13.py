"""Wave-45 operators: Brier decomposition, Gwet AC1, Jonckheere."""

from __future__ import annotations

from ontology_mapper_spark.operators.evaluate import brier_decomposition
from ontology_mapper_spark.operators.stats import (
    gwet_ac1,
    jonckheere_terpstra,
)


def test_brier_decomposition_identity_and_bounds(spark):
    rows = [(s, s > 50) for s in range(101)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    out = brier_decomposition(df, "s", "y", n_bins=10).collect()
    g = out[0]
    # Murphy identity to micro rounding
    assert abs(g["brier_micro"] - (g["rel_micro"] - g["res_micro"] + g["unc_micro"])) <= 2
    assert 0 <= g["brier_micro"] <= 1_000_000
    # score separates perfectly at the bin level: resolution ~ uncertainty
    assert abs(g["res_micro"] - g["unc_micro"]) <= 3000
    by = {r["bin"]: r for r in out}
    assert by[0]["conf_micro"] == 50_000 and by[9]["conf_micro"] == 950_000


def test_brier_perfectly_calibrated_bins(spark):
    # bin b has positive rate equal to its midpoint -> REL ~ 0
    rows = []
    for b in range(10):
        mid = (2 * b + 1) / 20
        npos = round(mid * 20)
        rows += [(b * 10 + 5, i < npos) for i in range(20)]
    df = spark.createDataFrame(rows, "s long, y boolean")
    g = brier_decomposition(df, "s", "y", n_bins=10).collect()[0]
    assert g["rel_micro"] == 0


def test_gwet_ac1_perfect_agreement(spark):
    rows = [(i, "x") for i in range(5) for _ in range(3)] + [
        (i, "y") for i in range(5, 8) for _ in range(3)
    ]
    df = spark.createDataFrame(rows, "i long, c string")
    r = gwet_ac1(df, "i", "c").collect()[0]
    assert r["n_raters"] == 3 and r["n_categories"] == 2
    assert r["p_a_micro"] == 1_000_000
    assert r["ac1_micro"] == 1_000_000


def test_gwet_ac1_skewed_panel_beats_kappa_paradox(spark):
    from ontology_mapper_spark.operators.stats import fleiss_kappa
    # 18 items all-'a' agreement, 2 items split: kappa craters, AC1 stays high
    rows = [(i, "a") for i in range(18) for _ in range(3)]
    rows += [(100, "a"), (100, "b"), (100, "b"), (101, "b"), (101, "a"), (101, "a")]
    df = spark.createDataFrame(rows, "i long, c string")
    ac1 = gwet_ac1(df, "i", "c").collect()[0]["ac1_micro"]
    kap = fleiss_kappa(df, "i", "c").collect()[0]["kappa_micro"]
    assert ac1 > kap
    assert ac1 > 800_000


def test_jonckheere_perfect_increase(spark):
    # groups strictly ordered: a < b < c with all values separated
    rows = (
        [("a", v) for v in (1, 2)]
        + [("b", v) for v in (3, 4)]
        + [("c", v) for v in (5, 6)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    r = jonckheere_terpstra(df, "g", "v", ("a", "b", "c")).collect()[0]
    # JT = sum of pairwise U = 3 pairs * 4 = 12 -> jt2 = 24; E2 = (36-12)/2=12
    assert r["jt2"] == 24 and r["e2"] == 12
    assert r["z_milli"] > 2000  # strong positive trend


def test_jonckheere_reversed_is_negative(spark):
    rows = (
        [("a", v) for v in (5, 6)]
        + [("b", v) for v in (3, 4)]
        + [("c", v) for v in (1, 2)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    r = jonckheere_terpstra(df, "g", "v", ("a", "b", "c")).collect()[0]
    assert r["jt2"] == 0
    assert r["z_milli"] < -2000


def test_jonckheere_ties_half_credit(spark):
    # a=[1], b=[1]: tie -> JT2 = 1 (half credit doubled)
    df = spark.createDataFrame([("a", 1), ("b", 1)], "g string, v long")
    r = jonckheere_terpstra(df, "g", "v", ("a", "b")).collect()[0]
    assert r["jt2"] == 1 and r["e2"] == 1
