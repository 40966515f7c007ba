"""Resnik/Lin semantic similarity + integer k-means: semantics and
partitioning-invariance."""

import math

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.clustering import kmeans_micro, _trunc_div
from ontology_mapper_spark.operators.semsim import resnik_lin


def _py_ancestors(n, parent):
    out = {n: 0}
    d = 0
    while n in parent:
        n = parent[n]
        d += 1
        out[n] = d
    return out


def test_resnik_lin_matches_python_reference(spark):
    # binary tree over 0..14, parent = (i-1)//2
    nodes = list(range(15))
    parent = {i: (i - 1) // 2 for i in nodes if i >= 1}
    edges = spark.createDataFrame(
        [(c, p) for c, p in parent.items()], "child long, parent long"
    )
    nd = spark.createDataFrame([(n,) for n in nodes], "n long")
    pairs = spark.createDataFrame(
        [(7, 8), (7, 12), (3, 4), (14, 1)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r
        for r in resnik_lin(edges, pairs, nd, root=0).collect()
    }

    # python reference
    desc = {n: 0 for n in nodes}
    for x in nodes:
        for a in _py_ancestors(x, parent):
            desc[a] += 1  # inclusive
    ic = {n: round(-math.log(desc[n] / 15) * 1e6) for n in nodes}
    for a, b in [(7, 8), (7, 12), (3, 4), (14, 1)]:
        anc_a = _py_ancestors(a, parent)
        anc_b = _py_ancestors(b, parent)
        common = set(anc_a) & set(anc_b)
        # max root-depth = min depth-from-a among common on the chain
        rd = {c: len(_py_ancestors(c, parent)) - 1 for c in common}
        lca = max(common, key=lambda c: (rd[c], -c))
        r = got[(a, b)]
        assert r["lca"] == lca and r["lca_depth"] == rd[lca]
        assert abs(r["resnik_micro"] - ic[lca]) <= 1  # libm 1-ulp slack
        lin = round(2e6 * r["resnik_micro"] / (ic[a] + ic[b]))
        assert abs(r["lin_micro"] - lin) <= 1


def test_trunc_div_matches_duckdb():
    import duckdb

    for s, n in [(-7, 2), (7, 2), (-8, 4), (0, 3), (-1, 5)]:
        want = duckdb.sql(
            f"SELECT CAST({s} AS BIGINT) // CAST({n} AS BIGINT)"
        ).fetchone()[0]
        assert _trunc_div(s, n) == want


def test_kmeans_partitioning_invariant_and_sane(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [2.0, 2.0] if i % 2 == 0 else [-2.0, -2.0]
        rows.append((i, [base[0] + rng.uniform(-0.3, 0.3),
                         base[1] + rng.uniform(-0.3, 0.3)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a1 = kmeans_micro(df.repartition(1), k=2, iters=3).collect()
    a7 = kmeans_micro(df.repartition(7, "vec_id"), k=2, iters=3).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a7))

    # two well-separated blobs must be split by parity after 3 rounds
    by_cl = {}
    for r in a1:
        by_cl.setdefault(r["cluster"], set()).add(r["vec_id"] % 2)
    assert all(len(v) == 1 for v in by_cl.values())
    assert len(by_cl) == 2
