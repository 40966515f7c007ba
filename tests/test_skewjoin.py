"""Skew-aware join/agg helpers: exact equivalence with the plain forms,
plus plan assertions that the hot path really is broadcast (no shuffle of
the hub's rows)."""

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.skewjoin import (
    hot_key_broadcast_join,
    hot_keys,
    salted_two_phase_agg,
)


def _skewed(spark):
    # key "hub" carries 5000 rows; 50 cold keys carry 10 each
    big = spark.range(0, 5000).select(
        F.lit("hub").alias("k"), F.col("id").alias("payload")
    ).unionByName(
        spark.range(0, 500).select(
            F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"),
            (F.col("id") + 10_000).alias("payload"),
        )
    )
    small = spark.createDataFrame(
        [("hub", "H")] + [(f"c{i}", f"V{i}") for i in range(50)] + [("orphan", "O")],
        ["k", "label"],
    )
    return big, small


def test_hot_keys_threshold(spark):
    big, _ = _skewed(spark)
    assert {r.k for r in hot_keys(big, "k", 1000).collect()} == {"hub"}
    assert hot_keys(big, "k", 5000).count() == 0


def test_hot_key_broadcast_join_matches_plain_inner_and_left(spark):
    big, small = _skewed(spark)
    for how in ("inner", "left"):
        got = hot_key_broadcast_join(big, small, "k", hot_threshold=1000, how=how)
        want = big.join(small, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), how


def test_hot_key_broadcast_join_rejects_right(spark):
    import pytest

    big, small = _skewed(spark)
    with pytest.raises(ValueError):
        hot_key_broadcast_join(big, small, "k", how="right")


def test_hot_half_is_broadcast_in_plan(spark):
    big, small = _skewed(spark)
    plan = hot_key_broadcast_join(
        big, small, "k", hot_threshold=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_two_phase_agg_collect_set(spark):
    big, _ = _skewed(spark)
    got = {
        r.k: sorted(r.vals)
        for r in salted_two_phase_agg(
            big,
            "k",
            partial=lambda: [F.collect_set("payload").alias("_p")],
            merge=lambda: [
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("_p")))
                ).alias("vals")
            ],
            salt_n=8,
        ).collect()
    }
    want = {
        r.k: sorted(r.vals)
        for r in big.groupBy("k")
        .agg(F.collect_set("payload").alias("vals"))
        .collect()
    }
    assert got == want


def test_cc_hot_threshold_bit_parity(spark):
    from ontology_mapper_spark.pipeline.canonicalize import connected_components

    # star hub (one node of degree 200) + a disjoint chain + a triangle
    edges = (
        [("hub", f"s{i}") for i in range(200)]
        + [(f"p{i}", f"p{i+1}") for i in range(20)]
        + [("t0", "t1"), ("t1", "t2"), ("t2", "t0")]
    )
    df = spark.createDataFrame(edges, ["src_iri", "dst_iri"])
    plain = {(r.node, r.component) for r in connected_components(df).collect()}
    skewed = {
        (r.node, r.component)
        for r in connected_components(df, hot_degree_threshold=50).collect()
    }
    assert plain == skewed
    # the hub's component label is the min over the whole star
    comp = dict(plain)
    assert comp["hub"] == "hub"  # "hub" < "s0"
    assert comp["s7"] == "hub"


def test_cc_local_fast_path_bit_parity(spark):
    from ontology_mapper_spark.pipeline.canonicalize import connected_components

    edges = (
        [("hub", f"s{i}") for i in range(50)]
        + [(f"p{i}", f"p{i+1}") for i in range(30)]
        + [("x", "y"), ("y", "z"), ("z", "x"), ("a", "a")]  # self-loop dropped
    )
    df = spark.createDataFrame(edges, ["src_iri", "dst_iri"])
    dist = {(r.node, r.component) for r in connected_components(df).collect()}
    stats: dict = {}
    loc = {
        (r.node, r.component)
        for r in connected_components(
            df, local_threshold=10_000, stats=stats
        ).collect()
    }
    assert loc == dist
    assert stats == {"iterations": 0, "local": True}
    # over-threshold graphs fall through to the distributed loop
    stats2: dict = {}
    fallthrough = {
        (r.node, r.component)
        for r in connected_components(df, local_threshold=3, stats=stats2).collect()
    }
    assert fallthrough == dist
    assert stats2.get("local") is None and stats2["iterations"] >= 1


def test_canonical_mapping_local_fast_path_parity(spark):
    """canonical_mapping defaults to the size-gated local CC (VERDICT r2
    item 6); labels must match the distributed loop bit-for-bit, and an
    over-threshold graph must fall through."""
    from ontology_mapper_spark.pipeline.canonicalize import canonical_mapping

    terms = spark.createDataFrame(
        [(f"iri:{c}",) for c in "abcdefg"], ["class_iri"]
    )
    xrefs = spark.createDataFrame(
        [("iri:a", "iri:b"), ("iri:b", "iri:c"), ("iri:e", "iri:f")],
        ["src_iri", "dst_iri"],
    )
    local = {
        (r.class_iri, r.canonical_iri)
        for r in canonical_mapping(terms, xrefs).collect()
    }
    dist = {
        (r.class_iri, r.canonical_iri)
        for r in canonical_mapping(terms, xrefs, local_threshold=0).collect()
    }
    fall = {
        (r.class_iri, r.canonical_iri)
        for r in canonical_mapping(terms, xrefs, local_threshold=1).collect()
    }
    assert local == dist == fall
    assert ("iri:c", "iri:a") in local and ("iri:d", "iri:d") in local
