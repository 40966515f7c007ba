"""End-to-end incremental pipeline: two trickle batches must produce
exactly what a from-scratch run over the final corpus produces, at
delta-proportional stage cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.kg_fixture import terms_df, xrefs_df
from ontology_mapper_spark.pipeline.incremental_cc import compact_triples
from ontology_mapper_spark.pipeline.incremental_runner import run_incremental_batch

BUCKETS = 8
SCHEMA = "conv_id string, turn_idx int, text string"

BATCH1 = [
    ("cA", 0, "the hash join beats a table scan"),
    ("cA", 1, "window over stream processing"),
    ("cB", 0, "vector data and a sort merge"),
]
BATCH2_NEW = [
    ("cC", 0, "another hash join and a query here"),
    ("cD", 0, "group by window"),
]


def test_two_batches_equal_from_scratch(spark, tmp_path):
    terms = terms_df(spark)
    xrefs = xrefs_df(spark)
    out = str(tmp_path / "inc")

    tr1 = spark.createDataFrame(BATCH1, SCHEMA)
    s1 = run_incremental_batch(
        spark, tr1, terms, xrefs, out, buckets=BUCKETS, run_ts="2026-01-01"
    )
    assert s1["detect"]["changed_buckets"]
    assert s1["canonicalize"].get("bootstrap") is True

    # batch 2: two new conversations + one new xref edge merging components
    tr2 = spark.createDataFrame(BATCH1 + BATCH2_NEW, SCHEMA)
    delta_edge = spark.createDataFrame(
        [("http://ex.org/cls/0004", "http://ex.org/cls/0005")],
        ["src_iri", "dst_iri"],
    )
    s2 = run_incremental_batch(
        spark, tr2, terms, delta_edge, out, buckets=BUCKETS, run_ts="2026-01-01"
    )
    # delta-proportional: only the new conversations' buckets recomputed
    new_buckets = {
        r.b
        for r in spark.createDataFrame(BATCH2_NEW, SCHEMA)
        .select(F.pmod(F.xxhash64("conv_id"), F.lit(BUCKETS)).alias("b"))
        .distinct()
        .collect()
    }
    assert set(s2["detect"]["changed_buckets"]) == new_buckets
    assert s2["canonicalize"]["n_merges"] >= 1

    # final state == from-scratch over the full corpus + full edge set
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )
    from ontology_mapper_spark.pipeline.canonicalize import connected_components
    from ontology_mapper_spark.pipeline.materialize import extract_triples

    full_m = detect_mentions(spark, tr2, build_dictionary(terms))
    full_l = link_mentions(spark, full_m, terms, idf=None)
    got_links = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern, r.class_iri, r.rank)
        for r in spark.read.parquet(f"{out}/links").collect()
    }
    want_links = {
        (r.conv_id, r.turn_idx, r.begin, r.end, r.pattern, r.class_iri, r.rank)
        for r in full_l.collect()
    }
    assert got_links == want_links

    got_triples = {
        tuple(r) for r in compact_triples(spark, f"{out}/triples").collect()
    }
    want_triples = {
        tuple(r)
        for r in extract_triples(full_l, run_ts="2026-01-01").collect()
    }
    assert got_triples == want_triples

    all_edges = xrefs.unionByName(delta_edge)
    got_canon = {
        (r.node, r.component)
        for r in spark.read.parquet(f"{out}/canonical_labels").collect()
    }
    want_canon = {
        (r.node, r.component)
        for r in connected_components(all_edges).collect()
    }
    assert got_canon == want_canon

    # incremental co-mention edges: bucket partials compact to exactly the
    # full recompute (symmetric window, window_turns=2)
    from ontology_mapper_spark.pipeline.comention import comention_edges
    from ontology_mapper_spark.pipeline.incremental_cc import compact_edges

    got_edges = {
        (r.entity_a, r.entity_b, r.n_comentions)
        for r in compact_edges(spark, f"{out}/edges").collect()
    }
    want_edges = {
        (r.entity_a, r.entity_b, r.n_comentions)
        for r in comention_edges(full_l, window_turns=2).collect()
    }
    assert got_edges == want_edges and got_edges

    # third batch with nothing new: every stage is a no-op
    s3 = run_incremental_batch(
        spark, tr2, terms, None, out, buckets=BUCKETS, run_ts="2026-01-01"
    )
    assert s3["detect"]["changed_buckets"] == []
    assert s3["link"]["changed_buckets"] == []
    assert s3["canonicalize"] == {"skipped": True}
    assert s3["materialize"]["changed_buckets"] == []
    assert s3["edges"]["changed_buckets"] == []
