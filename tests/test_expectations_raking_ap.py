"""Unit tests for the qb73-qb75 wave: expectations rule engine,
raking/IPF margin fitting, average precision — closed-form cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontology_mapper_spark.operators.dq import expectations_report
from ontology_mapper_spark.operators.evaluate import average_precision_at_k
from ontology_mapper_spark.operators.mixing import raking_weights


def test_expectations_counts_each_failure_mode(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5),
            (2, None, 50),  # null text
            (2, "c", 500),  # duplicate id
            (4, "d", -1),  # out of range
        ],
        "doc_id long, text string, n_chars long",
    )
    rules = [
        {"rule_id": "r1", "column": "text", "type": "not_null"},
        {"rule_id": "r2", "column": "doc_id", "type": "unique"},
        {
            "rule_id": "r3",
            "column": "n_chars",
            "type": "range",
            "lo": 0,
            "hi": 100,
        },
        {
            "rule_id": "r4",
            "column": "text",
            "type": "regex",
            "pattern": "^[a-z]$",
        },
    ]
    out = {r["rule_id"]: r for r in expectations_report(df, rules).collect()}
    assert out["r1"]["n_pass"] == 3 and out["r1"]["ok"] == 0
    assert out["r2"]["n_pass"] == 3  # distinct ids
    assert out["r2"]["ok"] == 0
    assert out["r3"]["n_pass"] == 2  # 5 and 50 in range; 500, -1 out
    assert out["r4"]["n_pass"] == 3  # null text fails the regex
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["r3"]["pass_micro"] == 500_000


def test_expectations_all_pass(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    rules = [
        {"rule_id": "u", "column": "id", "type": "unique"},
        {"rule_id": "n", "column": "s", "type": "not_null"},
    ]
    out = expectations_report(df, rules).collect()
    assert all(r["ok"] == 1 and r["pass_micro"] == 1_000_000 for r in out)


def test_raking_matches_reference_margins(spark):
    # current over-samples row 'a': cells a/0=30, b/1=10; reference is
    # balanced 10 each over {a,b}x{0,1} -> raking should pull row
    # masses to ~half of current total each
    cur_rows = [("a", 0)] * 30 + [("b", 1)] * 10
    ref_rows = (
        [("a", 0)] * 10 + [("a", 1)] * 10 + [("b", 0)] * 10 + [("b", 1)] * 10
    )
    cur = spark.createDataFrame(cur_rows, "r string, c long")
    ref = spark.createDataFrame(ref_rows, "r string, c long")
    out = {
        (x["r"], x["c"]): x
        for x in raking_weights(cur, ref, "r", "c", rounds=2).collect()
    }
    # target row mass for each of a, b = 20/40 * 40 * 1e6 = 20e6
    a = out[("a", 0)]
    b = out[("b", 1)]
    assert abs(a["row_mass_micro"] - 20_000_000) <= 40  # rounding ulps
    assert abs(b["row_mass_micro"] - 20_000_000) <= 40
    # a is downweighted, b upweighted
    assert a["w_micro"] < 1_000_000 < b["w_micro"]


def test_average_precision_closed_forms(spark):
    # query 1: relevant at ranks 1,2 of 5 -> AP = 1
    # query 2: relevant at ranks 2,4    -> AP = (1/2 + 2/4)/2 = 0.5
    # query 3: nothing relevant          -> null
    rows = []
    for i, (score, rel) in enumerate([(50, 1), (40, 1), (30, 0), (20, 0)]):
        rows.append((1, i, score, rel))
    for i, (score, rel) in enumerate([(50, 0), (40, 1), (30, 0), (20, 1)]):
        rows.append((2, i, score, rel))
    for i, (score, rel) in enumerate([(50, 0), (40, 0)]):
        rows.append((3, i, score, rel))
    df = spark.createDataFrame(rows, "q long, id long, s long, rel long")
    out = {
        r["q"]: r
        for r in average_precision_at_k(df, "q", "id", "s", "rel", k=10)
        .collect()
    }
    assert out[1]["ap_micro"] == 1_000_000
    assert out[2]["ap_micro"] == 500_000
    assert out[3]["ap_micro"] is None
    assert out[2]["n_rel"] == 2 and out[2]["n_rel_at_k"] == 2


def test_average_precision_k_cutoff(spark):
    # relevant item parked at rank 3 with k=2: no credit, denominator
    # min(R, k) = 1 -> AP = 0
    rows = [(1, 1, 30, 0), (1, 2, 20, 0), (1, 3, 10, 1)]
    df = spark.createDataFrame(rows, "q long, id long, s long, rel long")
    out = average_precision_at_k(df, "q", "id", "s", "rel", k=2).collect()[0]
    assert out["ap_micro"] == 0
    assert out["n_rel"] == 1 and out["n_rel_at_k"] == 0
