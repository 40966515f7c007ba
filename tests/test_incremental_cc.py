"""Delta-aware CC: incremental merge == full recompute, touching only the
buckets that contain remapped/new rows; incremental materialize parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ontology_mapper_spark.pipeline.canonicalize import connected_components
from ontology_mapper_spark.pipeline.incremental_cc import (
    incremental_components,
    write_component_labels,
)

BUCKETS = 8


def _labels_set(spark, path):
    return {
        (r.node, r.component) for r in spark.read.parquet(path).collect()
    }


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, ["src_iri", "dst_iri"])


def test_incremental_cc_matches_full_recompute(spark, tmp_path):
    path = str(tmp_path / "labels")
    # two chains + an isolated pair
    base = [
        ("a1", "a2"), ("a2", "a3"),
        ("b1", "b2"), ("b2", "b3"),
        ("c1", "c2"),
    ]
    write_component_labels(
        connected_components(_edges_df(spark, base)), path, buckets=BUCKETS
    )
    before = _labels_set(spark, path)
    assert ("a3", "a1") in before and ("b3", "b1") in before

    # delta: merge the a- and b-chains, attach a NEW node to c, and add a
    # disjoint brand-new pair
    delta = [("a3", "b1"), ("c2", "c0"), ("z1", "z2")]
    r = incremental_components(
        spark, path, _edges_df(spark, delta), buckets=BUCKETS
    )
    assert r["n_merges"] >= 1 and r["n_new_nodes"] == 3

    got = _labels_set(spark, path)
    full = {
        (r_.node, r_.component)
        for r_ in connected_components(_edges_df(spark, base + delta)).collect()
    }
    assert got == full
    # the new-node-becomes-min case: c0 < c1 pulls the c component down
    assert ("c1", "c0") in got and ("c2", "c0") in got and ("c0", "c0") in got


def test_incremental_cc_touches_only_delta_buckets(spark, tmp_path):
    path = str(tmp_path / "labels")
    base = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(0, 40, 2)]
    write_component_labels(
        connected_components(_edges_df(spark, base)), path, buckets=BUCKETS
    )
    pre = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    # merge exactly one pair of two-node components
    r = incremental_components(
        spark, path, _edges_df(spark, [("n001", "n002")]), buckets=BUCKETS
    )
    changed = set(r["changed_buckets"])
    assert changed  # something was rewritten
    for d, mt in pre.items():
        b = int(d.split("=")[1])
        if b not in changed:
            assert os.path.getmtime(os.path.join(path, d)) == mt, d
    # unchanged rows byte-identical: every label not in a merged component
    # is untouched by construction (dirs not rewritten)
    got = _labels_set(spark, path)
    full = {
        (r_.node, r_.component)
        for r_ in connected_components(
            _edges_df(spark, base + [("n001", "n002")])
        ).collect()
    }
    assert got == full


def test_incremental_cc_noop_on_intra_component_edge(spark, tmp_path):
    path = str(tmp_path / "labels")
    base = [("a1", "a2"), ("a2", "a3")]
    write_component_labels(
        connected_components(_edges_df(spark, base)), path, buckets=BUCKETS
    )
    r = incremental_components(
        spark, path, _edges_df(spark, [("a1", "a3")]), buckets=BUCKETS
    )
    assert r["changed_buckets"] == [] and r["n_merges"] == 0


def test_incremental_cc_detects_mid_swap_corruption(spark, tmp_path):
    """ADVICE r2: the per-bucket swap is not atomic across buckets; a crash
    mid-swap must be DETECTED on the next call, not silently merged onto."""
    import shutil

    import pytest

    path = str(tmp_path / "labels")
    base = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(0, 40, 2)]
    write_component_labels(
        connected_components(_edges_df(spark, base)), path, buckets=BUCKETS
    )
    # healthy table: incremental batch succeeds and refreshes the marker
    incremental_components(
        spark, path, _edges_df(spark, [("n001", "n002")]), buckets=BUCKETS
    )
    # simulate a mid-swap crash: one bucket dir vanishes after the marker
    # was committed
    victim = next(d for d in sorted(os.listdir(path)) if d.startswith("bucket="))
    shutil.rmtree(os.path.join(path, victim))
    with pytest.raises(RuntimeError, match="fingerprint verification"):
        incremental_components(
            spark, path, _edges_df(spark, [("n003", "n004")]), buckets=BUCKETS
        )


def test_incremental_cc_legacy_table_without_marker(spark, tmp_path):
    """Pre-marker tables verify nothing and adopt a marker on the first
    successful swap."""
    from ontology_mapper_spark.pipeline.incremental import BUCKET_MARKER

    path = str(tmp_path / "labels")
    base = [("a1", "a2"), ("b1", "b2")]
    write_component_labels(
        connected_components(_edges_df(spark, base)), path, buckets=BUCKETS
    )
    os.remove(os.path.join(path, BUCKET_MARKER))  # legacy table
    incremental_components(
        spark, path, _edges_df(spark, [("a2", "b1")]), buckets=BUCKETS
    )
    assert os.path.exists(os.path.join(path, BUCKET_MARKER))
    got = _labels_set(spark, path)
    full = {
        (r_.node, r_.component)
        for r_ in connected_components(
            _edges_df(spark, base + [("a2", "b1")])
        ).collect()
    }
    assert got == full


def test_incremental_materialize_parity_after_compaction(spark, tmp_path):
    from ontology_mapper_spark.datagen import build_snapshot
    from ontology_mapper_spark.kg_fixture import terms_df
    from ontology_mapper_spark.pipeline.incremental import (
        incremental_detect,
        incremental_link,
    )
    from ontology_mapper_spark.pipeline.incremental_cc import (
        compact_triples,
        incremental_materialize,
    )
    from ontology_mapper_spark.pipeline.materialize import extract_triples

    terms = terms_df(spark)
    pats = ["hash join", "table scan", "window", "stream"]
    m_out = str(tmp_path / "mentions")
    l_out = str(tmp_path / "links")
    t_out = str(tmp_path / "triples")
    schema = "conv_id string, turn_idx int, text string"
    tr1 = spark.createDataFrame(
        [("cA", 0, "the hash join beats a table scan"),
         ("cB", 0, "window over stream")],
        schema,
    )
    incremental_detect(spark, tr1, pats, m_out, buckets=BUCKETS)
    incremental_link(spark, m_out, terms, l_out, dict_version="v1")
    r1 = incremental_materialize(spark, l_out, t_out, run_ts="2026-01-01")
    assert r1["changed_buckets"]

    full = {
        tuple(r_)
        for r_ in extract_triples(
            spark.read.parquet(l_out).drop("bucket"), run_ts="2026-01-01"
        ).collect()
    }
    got = {tuple(r_) for r_ in compact_triples(spark, t_out).collect()}
    assert got == full

    # second run with no changes: no-op
    r2 = incremental_materialize(spark, l_out, t_out, run_ts="2026-01-01")
    assert r2["changed_buckets"] == [] and r2["removed_buckets"] == []

    # grow one conversation → only its bucket re-materializes
    tr2 = spark.createDataFrame(
        [("cA", 0, "the hash join beats a table scan"),
         ("cB", 0, "window over stream"),
         ("cC", 0, "another hash join here")],
        schema,
    )
    incremental_detect(spark, tr2, pats, m_out, buckets=BUCKETS)
    incremental_link(spark, m_out, terms, l_out, dict_version="v1")
    r3 = incremental_materialize(spark, l_out, t_out, run_ts="2026-01-01")
    assert r3["changed_buckets"]
    full2 = {
        tuple(r_)
        for r_ in extract_triples(
            spark.read.parquet(l_out).drop("bucket"), run_ts="2026-01-01"
        ).collect()
    }
    got2 = {tuple(r_) for r_ in compact_triples(spark, t_out).collect()}
    assert got2 == full2
