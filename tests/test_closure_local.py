"""Bit-parity of transitive_closure's driver-local BFS fast path with the
distributed doubling loop (mirror of the dedup_clusters/canonical_mapping
local-CC parity tests)."""

from __future__ import annotations


def _closure_sets(df):
    return {(r["node"], r["ancestor"], r["depth"]) for r in df.collect()}


def test_local_closure_parity_random_dag(spark):
    import random

    from ontology_mapper_spark.operators.graph import transitive_closure

    rng = random.Random(7)
    # layered DAG with skips and diamonds: parents always have smaller id
    edges = []
    for child in range(1, 120):
        for _ in range(rng.randint(1, 3)):
            edges.append((child, rng.randrange(0, child)))
    df = spark.createDataFrame(sorted(set(edges)), ["child", "parent"])
    local = transitive_closure(df)  # default threshold -> local path
    dist = transitive_closure(df, local_threshold=0)  # force the loop
    assert _closure_sets(local) == _closure_sets(dist)


def test_local_closure_parity_cycle_and_chain(spark):
    from ontology_mapper_spark.operators.graph import transitive_closure

    edges = [(1, 2), (2, 3), (3, 1), (4, 5)]  # 3-cycle + disjoint edge
    df = spark.createDataFrame(edges, ["child", "parent"])
    local = transitive_closure(df)
    dist = transitive_closure(df, local_threshold=0)
    s = _closure_sets(local)
    assert s == _closure_sets(dist)
    # cycle members reach each other at min depth, never themselves
    assert (1, 3, 2) in s and (1, 1, 3) not in s


def test_local_closure_string_nodes(spark):
    from ontology_mapper_spark.operators.graph import transitive_closure

    df = spark.createDataFrame(
        [("b", "a"), ("c", "b")], ["child", "parent"]
    )
    s = _closure_sets(transitive_closure(df))
    assert s == {("b", "a", 1), ("c", "b", 1), ("c", "a", 2)}
