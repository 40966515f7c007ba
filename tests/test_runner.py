"""Stage checkpoint/resume semantics (north_rule O1/O2 analogue)."""

from __future__ import annotations

from ontology_mapper_spark.pipeline.runner import PipelineRunner


def _statuses(result):
    return {e["stage"]: e["status"] for e in result["events"]}


def test_fresh_run_then_resume_skips(spark, tmp_path):
    out = str(tmp_path / "kg")
    r1 = PipelineRunner(spark, out, n_convs=20, n_terms=30, resume=False).run()
    assert set(_statuses(r1).values()) == {"ran"}
    r2 = PipelineRunner(spark, out, n_convs=20, n_terms=30, resume=True).run()
    assert set(_statuses(r2).values()) == {"skipped"}


def test_param_change_invalidates(spark, tmp_path):
    out = str(tmp_path / "kg")
    PipelineRunner(spark, out, n_convs=20, n_terms=30, resume=False).run()
    # different transcript count → transcripts and all downstream re-run,
    # snapshot/canonicalize (which depend only on the snapshot) are reused
    r = PipelineRunner(spark, out, n_convs=25, n_terms=30, resume=True).run()
    st = _statuses(r)
    assert st["snapshot"] == "skipped"
    assert st["canonicalize"] == "skipped"
    assert st["transcripts"] == "ran"
    assert st["mention_detect"] == "ran"
    assert st["link_score"] == "ran"
    assert st["materialize"] == "ran"


def test_outputs_readable_and_metrics_written(spark, tmp_path):
    out = str(tmp_path / "kg")
    PipelineRunner(spark, out, n_convs=20, n_terms=30, resume=False).run()
    triples = spark.read.parquet(f"{out}/materialize")
    assert triples.count() > 0
    assert set(triples.columns) >= {"subj", "pred", "obj", "obj_type", "lang"}
    metrics = spark.read.parquet(f"{out}/_metrics")
    stages = {r.stage for r in metrics.select("stage").distinct().collect()}
    assert {"snapshot", "transcripts", "mention_detect", "link_score"} <= stages
    assert metrics.where("n_rows < 0").count() == 0
