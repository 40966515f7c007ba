"""Wave-46 operators: Cochran's Q, personalized PageRank, percolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.graph import (
    percolation_sweep,
    personalized_pagerank,
)
from ontology_mapper_spark.operators.stats import cochran_q


def test_cochran_q_hand(spark):
    # 4 items, 3 treatments; t1 always succeeds, t2/t3 never:
    # C = (4,0,0): num = 2*(3*16 - 16) = 64; R_i = 1 each:
    # den = 3*4 - 4 = 8 -> Q = 8.0
    rows = [(i, "t1", True) for i in range(4)]
    rows += [(i, t, False) for i in range(4) for t in ("t2", "t3")]
    df = spark.createDataFrame(rows, "i long, t string, x boolean")
    r = cochran_q(df, "i", "t", "x", ("t1", "t2", "t3")).collect()[0]
    assert r["n_items"] == 4 and r["k_treatments"] == 3
    assert (r["c_t1"], r["c_t2"], r["c_t3"]) == (4, 0, 0)
    assert r["q_milli"] == 8000


def test_cochran_q_allones_cancel(spark):
    # adding all-one items changes nothing (they cancel)
    rows = [(i, "t1", True) for i in range(4)]
    rows += [(i, t, False) for i in range(4) for t in ("t2", "t3")]
    rows += [(100 + i, t, True) for i in range(3) for t in ("t1", "t2", "t3")]
    df = spark.createDataFrame(rows, "i long, t string, x boolean")
    r = cochran_q(df, "i", "t", "x", ("t1", "t2", "t3")).collect()[0]
    assert r["q_milli"] == 8000


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_ppr_localizes_to_seed_neighborhood(spark):
    # hub 'a' heavily connected to b,c; far pair x->y light
    rows = [("a", "b", 10), ("b", "a", 10), ("a", "c", 10), ("c", "a", 10),
            ("x", "y", 1), ("y", "x", 1)]
    out = personalized_pagerank(
        _edges(spark, rows), n_seeds=1, iterations=3, top_k=10,
        weight_col="weight",
    ).collect()
    by = {r["node"]: r for r in out}
    assert by["a"]["is_seed"]
    # seed neighborhood outranks the disconnected pair
    assert by["a"]["ppr_micro"] > by["x"]["ppr_micro"]
    assert by["b"]["ppr_micro"] > by["x"]["ppr_micro"]
    assert by["x"]["ppr_micro"] == 0 and by["y"]["ppr_micro"] == 0


def test_ppr_topk_total_order(spark):
    rows = [(f"n{i}", f"n{i+1}", 1) for i in range(30)]
    out = personalized_pagerank(
        _edges(spark, rows), n_seeds=2, iterations=2, top_k=5,
        weight_col="weight",
    ).collect()
    assert len(out) == 5
    scores = [r["ppr_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_percolation_thresholds_monotone(spark):
    # triangle with heavy edges + light tail
    rows = [("a", "b", 12), ("b", "c", 12), ("c", "a", 12),
            ("c", "d", 5), ("d", "e", 3), ("e", "f", 1)]
    out = {
        r["threshold"]: r
        for r in percolation_sweep(
            _edges(spark, rows), thresholds=(3, 6, 12), weight_col="weight"
        ).collect()
    }
    # t=3: abc+d+e connected (5 nodes, 1 comp), t=6: abc+? c-d dropped
    assert out[3]["n_nodes"] == 5 and out[3]["n_components"] == 1
    assert out[3]["giant_frac_micro"] == 1_000_000
    assert out[6]["n_nodes"] == 3 and out[6]["giant_size"] == 3
    assert out[12]["n_edges"] == 3
    # giant fraction never increases as threshold rises (here)
    assert out[12]["giant_size"] <= out[3]["giant_size"]
