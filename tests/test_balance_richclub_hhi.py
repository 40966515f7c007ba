"""Unit tests for the qb82-qb84 wave: covariate balance SMD,
rich-club curve, concentration panel — closed-form cases."""

from __future__ import annotations

from ontology_mapper_spark.operators.graph import rich_club
from ontology_mapper_spark.operators.mixing import concentration_panel
from ontology_mapper_spark.operators.stats import covariate_balance


def test_covariate_balance_flags_shifted_covariate(spark):
    # x balanced (same distribution), y shifted by ~2 sd in arm 1
    rows = []
    for i in range(40):
        rows.append((0, i % 5, i % 7))
        rows.append((1, i % 5, i % 7 + 6))
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    out = {
        r["covariate"]: r
        for r in covariate_balance(df, "arm", ["x", "y"]).collect()
    }
    assert out["x"]["smd_milli"] == 0
    assert out["x"]["balanced"] == 1
    assert abs(out["y"]["smd_milli"]) > 1000  # way past 0.1
    assert out["y"]["balanced"] == 0
    assert out["x"]["n0"] == 40 and out["x"]["n1"] == 40


def test_covariate_balance_degenerate_variance(spark):
    rows = [(0, 5)] * 4 + [(1, 5)] * 4  # constant covariate both arms
    df = spark.createDataFrame(rows, "arm long, x long")
    out = covariate_balance(df, "arm", ["x"]).collect()[0]
    assert out["smd_milli"] is None
    assert out["balanced"] is None


def test_rich_club_star_vs_clique(spark):
    # graph = 4-clique {1,2,3,4} plus pendant leaves 10..15 attached
    # to node 1: at k=1 leaves (deg 1) drop out but all clique nodes
    # (deg >= 3) stay; at k=2 only the clique remains with density 1
    edges = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges += [(1, leaf) for leaf in range(10, 16)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["k"]: r for r in rich_club(df, "src", "dst", (1, 2, 4)).collect()}
    assert out[2]["n_nodes"] == 4 and out[2]["phi_micro"] == 1_000_000
    assert out[4]["n_nodes"] == 1 and out[4]["phi_micro"] is None
    # k=1: clique nodes (deg 3+) survive, leaves (deg 1) do not
    assert out[1]["n_nodes"] == 4


def test_concentration_panel_extremes(spark):
    # group "mono": one unit only -> HHI = 1, effective n = 1
    # group "uni": 4 equal units -> HHI = 0.25, effective n = 4
    rows = [("mono", "u1")] * 8
    for u in ("a", "b", "c", "d"):
        rows += [("uni", u)] * 2
    df = spark.createDataFrame(rows, "g string, u string")
    out = {r["g"]: r for r in concentration_panel(df, "g", "u").collect()}
    assert out["mono"]["hhi_micro"] == 1_000_000
    assert out["mono"]["effective_n_milli"] == 1000
    assert out["mono"]["top1_share_micro"] == 1_000_000
    assert out["uni"]["hhi_micro"] == 250_000
    assert out["uni"]["effective_n_milli"] == 4000
    assert out["uni"]["top1_share_micro"] == 250_000
    assert out["uni"]["top3_share_micro"] == 750_000
