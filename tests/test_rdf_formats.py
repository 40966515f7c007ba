"""Round-trip + subset-grammar tests for the round-2 RDF formats: N-Quads
(distributed), TriG, RDF/XML, JSON-LD — completing the reference's 7-format
surface (core/parser.py:11-27) with the same serialize → re-parse → same
triple-set idiom as test_formats.py:43-87."""

from __future__ import annotations

import textwrap

from ontology_mapper_spark.sinks import (
    CURIE_EXPANSIONS,
    write_nquads,
    write_trig,
)
from ontology_mapper_spark.sources import (
    parse_jsonld,
    parse_rdfxml,
    read_jsonld,
    read_nquads,
    read_rdf,
    read_rdfxml,
    read_trig,
    write_jsonld,
    write_rdfxml,
)

TRIPLES = [
    ("http://ex.org/a", "skos:exactMatch", "http://ex.org/b", "uri", None),
    ("http://ex.org/a", "skos:prefLabel", 'Alpha "q"\nline', "literal", "en"),
    ("http://ex.org/b", "rdfs:label", "Beta\ttab\\slash", "literal", "en"),
    ("http://ex.org/c", "rdfs:comment", "plain", "literal", None),
    ("http://ex.org/c", "dcterms:source", "http://ex.org/onts/HP", "uri", None),
]


def _df(spark):
    return spark.createDataFrame(
        TRIPLES, ["subj", "pred", "obj", "obj_type", "lang"]
    )


def _expand(p):
    for pfx, ns in CURIE_EXPANSIONS.items():
        if p.startswith(pfx):
            return ns + p[len(pfx):]
    return p


EXPECT = {(s, _expand(p), o, t, lang) for s, p, o, t, lang in TRIPLES}


def test_nquads_roundtrip_with_graph(spark, tmp_path):
    path = str(tmp_path / "out.nq")
    write_nquads(_df(spark), path, graph_iri="http://ex.org/g1")
    back = read_nquads(spark, path)
    assert back.where("_corrupt").count() == 0
    got = {
        (r.subj, r.pred, r.obj, r.obj_type, r.lang, r.graph)
        for r in back.collect()
    }
    assert got == {(s, p, o, t, lang, "http://ex.org/g1")
                   for s, p, o, t, lang in EXPECT}
    # graphless lines read as default graph (NT file is valid NQ)
    path2 = str(tmp_path / "out2.nq")
    write_nquads(_df(spark), path2)
    back2 = read_nquads(spark, path2)
    assert back2.where("_corrupt").count() == 0
    assert back2.where("graph is not null").count() == 0


def test_trig_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.trig")
    write_trig(_df(spark), path, graph_iri="http://ex.org/g1")
    back = read_trig(spark, path)
    got = {
        (r.subj, r.pred, r.obj, r.obj_type, r.lang, r.graph)
        for r in back.collect()
    }
    assert got == {(s, p, o, t, lang, "http://ex.org/g1")
                   for s, p, o, t, lang in EXPECT}


def test_trig_graph_keyword_and_default(spark):
    from ontology_mapper_spark.sources import parse_trig

    rows = parse_trig(textwrap.dedent("""\
        @prefix : <http://ex.org/> .
        :x :p :y .
        GRAPH :g1 { :a :q :b . :a :r "lit" }
        :g2 { :c :s :d . }
        """))
    got = {(s, p, o, g) for s, p, o, _t, _l, _d, g in rows}
    assert ("http://ex.org/x", "http://ex.org/p", "http://ex.org/y", None) in got
    assert ("http://ex.org/a", "http://ex.org/q", "http://ex.org/b",
            "http://ex.org/g1") in got
    assert ("http://ex.org/a", "http://ex.org/r", "lit",
            "http://ex.org/g1") in got
    assert ("http://ex.org/c", "http://ex.org/s", "http://ex.org/d",
            "http://ex.org/g2") in got


def test_doc_form_writers_size_gated(spark, tmp_path):
    # single-document writers collect() — the gate makes that explicit
    # (VERDICT r2 item 5); allow_large opts out
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="ONE document"):
        write_rdfxml(df, str(tmp_path / "x.rdf"), max_triples=2)
    with pytest.raises(ValueError, match="ONE document"):
        write_jsonld(df, str(tmp_path / "x.jsonld"), max_triples=2)
    write_rdfxml(df, str(tmp_path / "y.rdf"), max_triples=2, allow_large=True)
    write_jsonld(
        df, str(tmp_path / "y.jsonld"), max_triples=2, allow_large=True
    )


def test_rdfxml_roundtrip(spark, tmp_path):
    path = str(tmp_path / "out.rdf")
    write_rdfxml(_df(spark), path)
    back = read_rdfxml(spark, path)
    got = {(r.subj, r.pred, r.obj, r.obj_type, r.lang) for r in back.collect()}
    assert got == EXPECT


def test_rdfxml_parser_subset():
    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
             xmlns:owl="http://www.w3.org/2002/07/owl#"
             xmlns:ex="http://ex.org/" xml:base="http://base.org">
      <owl:Class rdf:about="http://ex.org/A" ex:code="c1">
        <rdfs:label xml:lang="en">Alpha</rdfs:label>
        <rdfs:comment rdf:datatype="http://www.w3.org/2001/XMLSchema#string">typed</rdfs:comment>
        <rdfs:seeAlso rdf:resource="http://ex.org/B"/>
        <ex:nested>
          <rdf:Description rdf:about="http://ex.org/C">
            <rdfs:label>Inner</rdfs:label>
          </rdf:Description>
        </ex:nested>
        <ex:props rdf:parseType="Resource">
          <rdfs:label>anon</rdfs:label>
        </ex:props>
      </owl:Class>
      <rdf:Description rdf:ID="frag"><rdfs:label>Frag</rdfs:label></rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(text)
    trip = {(s, p, o, t) for s, p, o, t, _l, _d in rows}
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert ("http://ex.org/A", RDF + "type",
            "http://www.w3.org/2002/07/owl#Class", "uri") in trip
    assert ("http://ex.org/A", "http://ex.org/code", "c1", "literal") in trip
    lab = [r for r in rows if r[0] == "http://ex.org/A" and r[1] == RDFS + "label"][0]
    assert lab[2] == "Alpha" and lab[4] == "en"
    typed = [r for r in rows if r[1] == RDFS + "comment"][0]
    assert typed[5].endswith("#string") and typed[4] is None
    assert ("http://ex.org/A", RDFS + "seeAlso", "http://ex.org/B", "uri") in trip
    assert ("http://ex.org/A", "http://ex.org/nested", "http://ex.org/C",
            "uri") in trip
    assert ("http://ex.org/C", RDFS + "label", "Inner", "literal") in trip
    anon = [r for r in rows if r[1] == "http://ex.org/props"][0]
    assert anon[3] == "bnode"
    assert (anon[2], RDFS + "label", "anon", "literal") in trip
    assert ("http://base.org#frag", RDFS + "label", "Frag", "literal") in trip


def test_jsonld_roundtrip_document(spark, tmp_path):
    path = str(tmp_path / "out.jsonld")
    write_jsonld(_df(spark), path)
    back = read_jsonld(spark, path)
    got = {(r.subj, r.pred, r.obj, r.obj_type, r.lang) for r in back.collect()}
    assert got == EXPECT


def test_jsonld_lines_roundtrip(spark, tmp_path):
    from ontology_mapper_spark.sources import to_jsonld_lines

    path = str(tmp_path / "out_jsonl")
    to_jsonld_lines(_df(spark)).write.mode("overwrite").text(path)
    import os

    chunks = []
    for name in sorted(os.listdir(path)):
        if name.startswith("part-"):
            chunks.append(open(os.path.join(path, name)).read())
    jl = str(tmp_path / "all.jsonl")
    open(jl, "w").write("".join(chunks))
    back = read_jsonld(spark, jl)
    got = {(r.subj, r.pred, r.obj, r.obj_type, r.lang) for r in back.collect()}
    assert got == EXPECT


def test_jsonld_parser_subset():
    doc = {
        "@context": {
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "@vocab": "http://ex.org/",
            "knows": {"@id": "http://ex.org/knows", "@type": "@id"},
        },
        "@graph": [
            {
                "@id": "http://ex.org/A",
                "@type": "Widget",
                "rdfs:label": {"@value": "Alpha", "@language": "en"},
                "knows": "http://ex.org/B",
                "count": 3,
                "ratio": 1.5,
                "flag": True,
                "tags": ["x", "y"],
                "chain": {"@list": ["one", "two"]},
                "child": {"@id": "_:b1", "rdfs:label": "kid"},
            }
        ],
    }
    rows = parse_jsonld(doc)
    trip = {(s, p, o, t) for s, p, o, t, _l, _d in rows}
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    A = "http://ex.org/A"
    assert (A, RDF + "type", "http://ex.org/Widget", "uri") in trip
    lab = [r for r in rows
           if r[1] == "http://www.w3.org/2000/01/rdf-schema#label"
           and r[0] == A][0]
    assert lab[2] == "Alpha" and lab[4] == "en"
    assert (A, "http://ex.org/knows", "http://ex.org/B", "uri") in trip
    num = [r for r in rows if r[1] == "http://ex.org/count"][0]
    assert num[2] == "3" and num[5].endswith("#integer")
    assert (A, "http://ex.org/tags", "x", "literal") in trip
    assert (A, "http://ex.org/tags", "y", "literal") in trip
    # list expands to first/rest chain
    head = [r for r in rows if r[1] == "http://ex.org/chain"][0][2]
    first = [r for r in rows if r[0] == head and r[1] == RDF + "first"][0]
    assert first[2] == "one"
    # named bnode child node emitted and referenced
    assert (A, "http://ex.org/child", "_:b1", "bnode") in trip
    assert ("_:b1", "http://www.w3.org/2000/01/rdf-schema#label", "kid",
            "literal") in trip


def test_pipeline_triples_roundtrip_all_writable_formats(spark, tmp_path):
    """Integration: REAL pipeline triples (kg fixture detect→link→
    extract) survive every RDF writer → reader pair as the same triple
    set — the reference's test_formats.py idiom at pipeline level."""
    from ontology_mapper_spark.kg_fixture import terms_df
    from ontology_mapper_spark.pipeline import (
        build_dictionary,
        detect_mentions,
        link_mentions,
    )
    from ontology_mapper_spark.pipeline.materialize import extract_triples
    from ontology_mapper_spark.sinks import write_ntriples, write_turtle
    from ontology_mapper_spark.sources import read_ntriples, read_turtle

    docs = spark.createDataFrame(
        [("d1", 0, "the hash join beats a table scan"),
         ("d2", 0, "window over stream")],
        "conv_id string, turn_idx int, text string",
    )
    terms = terms_df(spark)
    links = link_mentions(
        spark, detect_mentions(spark, docs, build_dictionary(terms)), terms
    )
    triples = extract_triples(links)
    expect = {
        (r.subj, _expand(r.pred), r.obj, r.lang)
        for r in triples.collect()
    }
    assert expect

    nt = str(tmp_path / "p.nt")
    write_ntriples(triples, nt)
    got_nt = {(r.subj, r.pred, r.obj, r.lang)
              for r in read_ntriples(spark, nt).collect()}
    assert got_nt == expect

    tt = str(tmp_path / "p.ttl")
    write_turtle(triples, tt)
    got_tt = {(r.subj, r.pred, r.obj, r.lang)
              for r in read_turtle(spark, tt).collect()}
    assert got_tt == expect

    x = str(tmp_path / "p.rdf")
    write_rdfxml(triples, x)
    got_x = {(r.subj, r.pred, r.obj, r.lang)
             for r in read_rdfxml(spark, x).collect()}
    assert got_x == expect

    j = str(tmp_path / "p.jsonld")
    write_jsonld(triples, j)
    got_j = {(r.subj, r.pred, r.obj, r.lang)
             for r in read_jsonld(spark, j).collect()}
    assert got_j == expect


def test_read_rdf_dispatch(spark, tmp_path):
    path = str(tmp_path / "d.nq")
    write_nquads(_df(spark), path)
    assert read_rdf(spark, path).count() == len(TRIPLES)
    x = str(tmp_path / "d.rdf")
    write_rdfxml(_df(spark), x)
    assert read_rdf(spark, x).count() == len(TRIPLES)
    j = str(tmp_path / "d.jsonld")
    write_jsonld(_df(spark), j)
    assert read_rdf(spark, j).count() == len(TRIPLES)
