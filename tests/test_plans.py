"""Physical-plan assertions: the optimizations SURVEY.md §4 promises must
actually appear in the plans — pushdown reaching parquet, broadcast joins
on dictionary sides, no stray shuffles on map-only paths."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark):
    from ontology_mapper_spark.contract import QUERIES

    plan = plan_of(QUERIES["q01_pruned_scan_agg"](spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
    # column pruning: the scan reads only the 3 needed columns
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema
    assert "l_extendedprice" not in read_schema


def test_link_path_is_broadcast_no_shuffle(spark):
    """The 10^12-turn path: mention scan → broadcast hash join. Any
    sort-merge join or non-broadcast exchange here would shuffle the whole
    mention table at scale."""
    from ontology_mapper_spark.datagen import build_snapshot, build_transcripts
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )

    terms, _ = build_snapshot(spark, n_terms=30, seed=1)
    tr = build_transcripts(spark, n_convs=5, seed=1)
    links = link_mentions(
        spark, detect_mentions(spark, tr, build_dictionary(terms)), terms
    )
    plan = plan_of(links)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchanges allowed feed the broadcast (dictionary side)
    mention_side = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in mention_side


def test_broadcast_join_in_strategy_lookup(spark):
    from ontology_mapper_spark.contract import QUERIES

    plan = plan_of(QUERIES["q10_broadcast_default"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_single_shuffle(spark):
    from ontology_mapper_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(exact_dedup(d), mode="simple")
    # both windows (dup_count + rank) share ONE hash-partition exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_jaccard_stop_shingle_cap_in_plan(spark):
    """The fractional max_df cap must be present (window count + filter on
    the shingle key) and its corpus-size input must arrive via BROADCAST —
    a non-broadcast scalar join here would shuffle the exploded shingles
    twice."""
    from ontology_mapper_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=2, threshold=0.10, max_df_frac=0.2
    )
    plan = plan_of(out, mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the df-cap filter exists and runs over the windowed count
    assert "CEIL" in plan.upper()
    # functional parity with the absolute cap at this corpus size (500 docs
    # → ceil(0.2×500)=100)
    from ontology_mapper_spark.operators.dedup import ngram_jaccard_pairs as njp

    abs_out = njp(d, "text", "doc_id", shingle_n=2, threshold=0.10, max_df=100)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    expect = {(r.id_a, r.id_b) for r in abs_out.collect()}
    assert got == expect


def test_whole_stage_codegen_on_native_expressions(spark):
    """clean_description / classifier chains must stay inside codegen —
    a BatchEvalPython node would mean a row-at-a-time Python UDF leaked in."""
    from ontology_mapper_spark.contract import QUERIES

    for q in ("q04_clean_description", "q23_alignment_classifier"):
        plan = plan_of(QUERIES[q](spark, SF), mode="simple")
        # '*(N)' is simple-mode's WholeStageCodegen marker
        assert "*(1)" in plan, q
        assert "BatchEvalPython" not in plan, q


def test_no_python_udf_in_triple_extraction(spark):
    from ontology_mapper_spark.datagen import build_snapshot, build_transcripts
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )
    from ontology_mapper_spark.pipeline.materialize import extract_triples

    terms, _ = build_snapshot(spark, n_terms=30, seed=1)
    tr = build_transcripts(spark, n_convs=5, seed=1)
    links = link_mentions(
        spark, detect_mentions(spark, tr, build_dictionary(terms)), terms
    )
    plan = plan_of(extract_triples(links))
    # the mention-volume path may contain exactly the two sanctioned Python
    # surfaces: the Arrow scan (mapInPandas) and the dictionary-sized
    # scorer; no row-at-a-time BatchEvalPython anywhere
    assert "BatchEvalPython" not in plan


def test_kg_fixture_link_path_is_broadcast_no_shuffle(spark):
    """The oracled kg_links contract path (documents → detect → decision-
    table join) must keep the same broadcast-only property as the
    transcript path: any non-broadcast exchange on the mention side would
    shuffle the full corpus at scale."""
    from ontology_mapper_spark.contract import QUERIES

    plan = plan_of(QUERIES["kg_links_transcripts"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    mention_side = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in mention_side


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join via bucketing: two tables bucketed+sorted on the
    join key sort-merge join with ZERO exchanges — the 100 TB strategy
    for repeated large-large joins (SURVEY.md 'bucketing' lever)."""
    import uuid

    a_name = f"bk_a_{uuid.uuid4().hex[:8]}"
    b_name = f"bk_b_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    try:
        (
            df.withColumn("va", F.col("k") * 2)
            .write.bucketBy(8, "k").sortBy("k").saveAsTable(a_name)
        )
        (
            df.withColumn("vb", F.col("k") + 1)
            .write.bucketBy(8, "k").sortBy("k").saveAsTable(b_name)
        )
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a_name).join(spark.table(b_name), "k")
        plan = plan_of(joined, mode="simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")
