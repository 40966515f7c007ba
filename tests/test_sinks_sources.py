"""Round-trip and shape tests for sinks/sources — the reference's own test
idiom (test_formats.py round-trip golden: serialize → re-parse → same
content; SURVEY.md §5)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ontology_mapper_spark.sinks import (
    sssom_rows,
    to_ntriples_lines,
    write_ntriples,
    write_tabular,
)
from ontology_mapper_spark.sources import (
    SUPPORTED_INPUT_FORMATS,
    detect_format,
    read_concept_list,
    read_ntriples,
    read_selections_json,
)

TRIPLES = [
    ("http://ex.org/a", "skos:exactMatch", "http://ex.org/b", "uri", None),
    ("http://ex.org/a", "skos:prefLabel", "Alpha \"quoted\"\nline", "literal", "en"),
    ("http://ex.org/b", "rdfs:label", "Beta\ttab\\slash", "literal", "en"),
    # ADVICE regression: backslash immediately followed by 'n'/'t' — the
    # escaped form on disk is \\n, which a wrong-order unescape turns
    # into backslash+newline instead of backslash+'n'
    ("http://ex.org/c", "rdfs:comment", "path\\not\\tab", "literal", None),
    ("http://ex.org/a", "dcterms:source", "http://ex.org/onts/HP", "uri", None),
    ("http://ex.org/c", "rdfs:seeAlso", "http://ex.org/b", "uri", None),
]


def _triples_df(spark):
    return spark.createDataFrame(
        TRIPLES, ["subj", "pred", "obj", "obj_type", "lang"]
    )


def test_ntriples_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.nt")
    write_ntriples(_triples_df(spark), path)
    back = read_ntriples(spark, path)
    assert back.where("_corrupt").count() == 0
    got = {
        (r.subj, r.pred, r.obj, r.obj_type, r.lang)
        for r in back.collect()
    }
    # predicates were CURIE-expanded on write; map back for comparison
    from ontology_mapper_spark.sinks import CURIE_EXPANSIONS

    rev = {v: k for k, v in CURIE_EXPANSIONS.items()}
    norm = set()
    for s, p, o, t, lang in got:
        for ns, pre in rev.items():
            if p.startswith(ns):
                p = pre + p[len(ns):]
                break
        norm.add((s, p, o, t, lang))
    assert norm == set(TRIPLES)


def test_ntriples_lines_are_valid_shape(spark):
    lines = [r.line for r in to_ntriples_lines(_triples_df(spark)).collect()]
    assert all(line.endswith(" .") for line in lines)
    assert any('"Alpha \\"quoted\\"\\nline"@en' in line for line in lines)
    assert sum(line.count("<") >= 2 for line in lines) == len(lines)


def test_tabular_sink_columns(spark, tmp_path):
    path = str(tmp_path / "tab")
    write_tabular(_triples_df(spark), path, sep=",")
    # multiLine: the sink emits properly quoted CSV for embedded newlines
    back = spark.read.option("header", True).option("multiLine", True).csv(path)
    assert back.columns == ["Subject", "Predicate", "Object", "Object Type"]
    tags = {r["Object Type"] for r in back.collect()}
    assert tags == {"URI", "Literal"}


def test_sssom_rows(spark):
    out = sssom_rows(_triples_df(spark), mapping_date="2026-08-16")
    rows = {r.subject_id: r for r in out.collect()}
    assert set(out.columns) == {
        "subject_id", "subject_label", "predicate_id", "object_id",
        "object_label", "mapping_justification", "mapping_date",
    }
    # only the mapping predicates produce rows (exactMatch + seeAlso here)
    assert set(rows) == {"http://ex.org/a", "http://ex.org/c"}
    a = rows["http://ex.org/a"]
    # prefLabel preferred for subject; object label falls back to rdfs:label
    assert a.subject_label == 'Alpha "quoted"\nline'
    assert a.object_label == "Beta\ttab\\slash"
    assert a.mapping_justification == "semapv:ManualMappingCuration"
    assert a.mapping_date == "2026-08-16"


def test_format_detection_table():
    assert detect_format("x.ttl") == "turtle"
    assert detect_format("X.NT") == "nt"
    assert detect_format("a.owl") == "xml"
    assert detect_format("a.jsonld") == "json-ld"
    assert detect_format("a.unknown") is None
    assert len(set(SUPPORTED_INPUT_FORMATS.values())) == 7


def test_selections_and_concept_list_sources(spark, tmp_path):
    sel = {
        "fatigue": [
            {"uri": "http://ex/1", "label": "Fatigue", "ontology": "HP",
             "synonyms": ["tiredness"], "source": "bioportal",
             "relationship": "skos:exactMatch"},
            {"uri": "http://ex/2", "label": "Chronic fatigue", "ontology": "MONDO",
             "source": "ols"},
        ]
    }
    p = tmp_path / "sel.json"
    p.write_text(json.dumps(sel))
    df = read_selections_json(spark, str(p))
    assert df.count() == 2
    assert df.where(F.col("relationship").isNull()).count() == 1

    cl = tmp_path / "concepts.txt"
    cl.write_text("long covid\n\nfatigue\n")
    got = {(r.concept_key, r.label) for r in read_concept_list(spark, str(cl)).collect()}
    assert got == {("long_covid", "long covid"), ("fatigue", "fatigue")}


def test_turtle_and_nquads_sinks(spark, tmp_path):
    from ontology_mapper_spark.sinks import (
        to_nquads_lines,
        to_turtle_lines,
        turtle_header,
        write_turtle,
    )

    df = _triples_df(spark)
    ttl = [r.line for r in to_turtle_lines(df).collect()]
    # known CURIE predicates stay prefixed; header declares their prefixes
    assert any(" skos:exactMatch " in line for line in ttl)
    assert "@prefix skos:" in turtle_header()
    assert all(line.endswith(" .") for line in ttl)

    nq = [r.line for r in to_nquads_lines(df, graph_iri="http://ex.org/g").collect()]
    assert all(line.rstrip(" .").endswith("<http://ex.org/g>") for line in nq)
    assert len(nq) == df.count()

    out = str(tmp_path / "ttl")
    write_turtle(df, out)
    import os

    assert os.path.exists(os.path.join(out, "_header.ttl"))
