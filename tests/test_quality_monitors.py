"""Hand-computed checks for the round-3 quality-monitor operators:
CUSUM change-points, median/MAD outliers, equi-depth bins, community
quality (modularity + conductance), IVF hard negatives, int8
scalar-quantization report."""

from ontology_mapper_spark.operators.graph import community_quality
from ontology_mapper_spark.operators.similarity import (
    ivf_hard_negatives,
    scalar_quant_report,
)
from ontology_mapper_spark.operators.stats import (
    equidepth_bins,
    mad_outlier_summary,
)
from ontology_mapper_spark.operators.temporal import cusum_changepoints


def test_cusum_flags_sustained_shift(spark):
    # type "s": 10 days, first 5 at 1/day, last 5 at 9/day -> big drift
    rows = []
    for d in range(1, 6):
        rows.append((f"2024-01-0{d}T00:00:00", "s"))
    for d in range(1, 6):
        for _ in range(9):
            rows.append((f"2024-01-1{d - 1}T00:00:00", "s"))
    df = spark.createDataFrame(rows, "ts_s string, event_type string").selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "event_type"
    )
    out = {r["day"]: r for r in cusum_changepoints(df, "event_type", "ts").collect()}
    # D=10, T=50 -> dev = 10*n - 50: -40 for the quiet days, +40 loud
    assert out["2024-01-01"]["dev"] == -40
    assert out["2024-01-10"]["dev"] == 40
    # cusum bottoms at -200 after day 5 (|−200|·5 > 1·10·50=500 → shift)
    assert out["2024-01-05"]["cusum"] == -200
    assert out["2024-01-05"]["is_shift"]
    # final day returns to 0 — no flag
    assert out["2024-01-14"]["cusum"] == 0
    assert not out["2024-01-14"]["is_shift"]


def test_mad_outliers_lower_median_and_flags(spark):
    # g: values 10,10,10,10,1000 -> med=10, deviations 0,0,0,0,990
    # MAD = lower median of devs = 0 -> the 990 row is the only outlier
    rows = [("g", 10, i) for i in range(4)] + [("g", 1000, 4)]
    df = spark.createDataFrame(rows, "src string, x long, id long")
    r = mad_outlier_summary(df, "src", "x", "id", k=3).collect()[0]
    assert (r["n_rows"], r["med"], r["mad"]) == (5, 10, 0)
    assert r["n_outliers"] == 1 and r["max_abs_dev"] == 990


def test_mad_even_group_uses_lower_median(spark):
    rows = [("g", v, i) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "src string, x long, id long")
    r = mad_outlier_summary(df, "src", "x", "id").collect()[0]
    assert r["med"] == 2  # rank (4+1)//2 = 2 under (x, id)


def test_equidepth_bins_balanced(spark):
    rows = [("t", float(v), v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    out = equidepth_bins(df, "g", "v", "id", n_bins=5).collect()
    assert len(out) == 5
    by_bin = {r["bin"]: r for r in out}
    assert all(by_bin[b]["n_rows"] == 2 for b in range(1, 6))
    assert by_bin[1]["v_min_micro"] == 1_000_000
    assert by_bin[5]["v_max_micro"] == 10_000_000
    assert by_bin[1]["avg_micro"] == 1_500_000  # (1e6+2e6)/2


def test_community_quality_two_triangles_bridge(spark):
    # two triangles {1,2,3} {4,5,6} joined by edge 3-4; m=7
    e = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(e, "src long, dst long")
    labels = spark.createDataFrame(
        [(n, 1) for n in (1, 2, 3)] + [(n, 2) for n in (4, 5, 6)],
        "node long, label long",
    )
    out = {r["label"]: r for r in community_quality(edges, labels).collect()}
    for lab in (1, 2):
        r = out[lab]
        assert (r["n_nodes"], r["in_edges"], r["deg_sum"]) == (3, 3, 7)
        assert r["cut_edges"] == 1
        # round(3e6/7) - round(49*250000/49) = 428571 - 250000
        assert r["modularity_micro"] == 428571 - 250000
        # cut/min(7, 14-7) = 1/7
        assert r["conductance_micro"] == 142857


def test_community_quality_single_community_zero_modularity(spark):
    e = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(e, "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "node long, label long"
    )
    r = community_quality(edges, labels).collect()[0]
    # everything internal: Q = in/m − (2m/2m)² = 1 − 1 = 0; cut 0
    assert r["modularity_micro"] == 0 and r["cut_edges"] == 0
    assert r["conductance_micro"] == 0


def test_hard_negatives_label_and_ceiling_filters(spark):
    # 4 near-identical "a" vectors + 2 "b": negatives must be cross-label,
    # never self, and duplicate-level cosine is excluded by the ceiling
    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [1.0, 0.001], "a"),
        (3, [0.9, 0.1], "a"),
        (4, [0.0, 1.0], "b"),
        (5, [0.1, 1.0], "b"),
        (6, [1.0, 0.0], "b"),  # exact dup of 1 across labels
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = ivf_hard_negatives(
        df, n_centroids=2, nprobe=2, k=5, ceiling_micro=999_999
    ).collect()
    assert out, "non-empty"
    for r in out:
        assert r["query_label"] != r["neg_label"]
        assert r["vec_id"] != r["query_id"]
        assert r["cosine_micro"] < 999_999
    # the 1<->6 exact-dup pair (cosine 1.0) is excluded both directions
    pairs = {(r["query_id"], r["vec_id"]) for r in out}
    assert (1, 6) not in pairs and (6, 1) not in pairs


def test_scalar_quant_error_bounded_by_half_step(spark):
    rows = [(i, [i / 10.0, -i / 7.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = scalar_quant_report(df, levels=255).collect()
    assert {r["dim"] for r in out} == {0, 1}
    for r in out:
        width = r["max_micro"] - r["min_micro"]
        # |err| <= half a quantization step (+1 for the two roundings)
        assert r["max_abs_err_micro"] <= width // (2 * 255) + 1
        assert r["n_rows"] == 20
