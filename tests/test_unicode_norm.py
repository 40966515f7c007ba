"""NFC scrub: value semantics + the ASCII-lane plan guarantee."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.unicode_norm import nfc_scrub, strip_controls

DECOMPOSED = "café"  # e + combining acute
COMPOSED = "café"


def test_nfc_scrub_values(spark):
    rows = [
        (1, "plain ascii"),
        (2, DECOMPOSED),
        (3, "a\x01b\x07c"),          # controls stripped, tab/LF kept
        (4, "x\ty\nz"),
        (5, "\x02" + DECOMPOSED),    # both kinds of mess
        (6, None),
        (7, COMPOSED),               # already NFC: unchanged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in nfc_scrub(df, "text", "doc_id").collect()}

    assert len(out) == 7  # null row must not be dropped by lane routing
    assert out[1]["clean"] == "plain ascii" and not out[1]["changed"]
    assert out[2]["clean"] == COMPOSED and out[2]["changed"]
    assert out[2]["n_raw"] == 5 and out[2]["n_clean"] == 4
    assert out[3]["clean"] == "abc" and out[3]["n_ctrl"] == 2
    assert out[4]["clean"] == "x\ty\nz" and not out[4]["changed"]
    assert out[5]["clean"] == COMPOSED and out[5]["n_ctrl"] == 1
    assert out[6]["clean"] is None
    assert out[7]["clean"] == COMPOSED and not out[7]["changed"]
    # cross-check against Python's own NFC on the messy row
    assert out[5]["clean"] == unicodedata.normalize("NFC", DECOMPOSED)


def test_ascii_lane_has_no_python(spark):
    """The union plan must contain exactly one ArrowEvalPython node and
    the ASCII branch none — i.e. pure-ASCII corpora never pay the Python
    lane (the whole point of the filter-split-union design)."""
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = nfc_scrub(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_strip_controls_keeps_whitespace(spark):
    df = spark.createDataFrame([("\x00a\tb\nc\rd\x1f",)], "t string")
    got = df.select(strip_controls(F.col("t")).alias("c")).first()["c"]
    assert got == "a\tb\nc\rd"
