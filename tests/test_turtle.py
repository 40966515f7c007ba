"""Turtle reader: the reference's round-trip idiom (test_formats.py:43-87 —
serialize → re-parse → same triple set) for the engine's OWN turtle sink,
plus grammar-subset coverage on a hand-written ontology-style file."""

from __future__ import annotations

import textwrap

import pytest

from ontology_mapper_spark.sources.turtle import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    TurtleSyntaxError,
    parse_turtle,
    read_turtle,
)


def test_turtle_roundtrip_own_sink(spark, tmp_path):
    from ontology_mapper_spark.sinks import CURIE_EXPANSIONS, write_turtle

    triples = [
        ("http://ex.org/a", "skos:exactMatch", "http://ex.org/b", "uri", None),
        ("http://ex.org/a", "skos:prefLabel", 'Alpha "quoted"\nline', "literal", "en"),
        ("http://ex.org/b", "rdfs:label", "Beta\ttab\\slash", "literal", "en"),
        ("http://ex.org/c", "rdfs:comment", "path\\not\\tab", "literal", None),
        ("http://ex.org/c", "dcterms:source", "http://ex.org/onts/HP", "uri", None),
    ]
    df = spark.createDataFrame(
        triples, ["subj", "pred", "obj", "obj_type", "lang"]
    )
    path = str(tmp_path / "out.ttl")
    write_turtle(df, path)
    back = read_turtle(spark, path)
    got = {
        (r.subj, r.pred, r.obj, r.obj_type, r.lang) for r in back.collect()
    }
    # the sink stores predicates as CURIEs; the parser expands them
    expand = lambda p: next(  # noqa: E731
        (ns + p[len(pfx):] for pfx, ns in CURIE_EXPANSIONS.items()
         if p.startswith(pfx)), p
    )
    expect = {(s, expand(p), o, t, lang) for s, p, o, t, lang in triples}
    assert got == expect


SAMPLE = textwrap.dedent("""\
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix : <http://ex.org/> .
    @base <http://base.org/> .
    PREFIX owl: <http://www.w3.org/2002/07/owl#>

    # a comment
    :alpha a owl:Class ;
        rdfs:label "Alpha"@en , "Alpha prime" ;
        rdfs:comment '''multi
    line''' ;
        :count 42 ;
        :weight 1.5 ;
        :flag true ;
        :sameRef <rel> ;
        :typed "2026-01-01"^^xsd:date .

    :beta rdfs:seeAlso [ rdfs:label "anon" ; :count 7 ] .
    :gamma :list ( :alpha "two" 3 ) .
    _:b0 rdfs:label "named bnode" .
    """)


def test_parse_turtle_grammar_subset():
    rows = parse_turtle(SAMPLE)
    trip = {(s, p, o, t) for s, p, o, t, _lang, _dt in rows}
    EX = "http://ex.org/"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    assert (EX + "alpha", RDF_TYPE,
            "http://www.w3.org/2002/07/owl#Class", "uri") in trip
    # object list: two labels, one with a language tag
    labels = {(o, lang) for s, p, o, t, lang, _ in rows
              if s == EX + "alpha" and p == RDFS + "label"}
    assert labels == {("Alpha", "en"), ("Alpha prime", None)}
    # long string keeps the embedded newline
    assert (EX + "alpha", RDFS + "comment", "multi\nline", "literal") in trip
    # numeric / boolean shorthand carries the xsd datatype
    num = [r for r in rows if r[1] == EX + "count" and r[0] == EX + "alpha"][0]
    assert num[2] == "42" and num[5].endswith("#integer")
    dec = [r for r in rows if r[1] == EX + "weight"][0]
    assert dec[2] == "1.5" and dec[5].endswith("#decimal")
    flag = [r for r in rows if r[1] == EX + "flag"][0]
    assert flag[2] == "true" and flag[5].endswith("#boolean")
    # relative IRI resolves against @base
    assert (EX + "alpha", EX + "sameRef", "http://base.org/rel", "uri") in trip
    # explicit datatype
    typed = [r for r in rows if r[1] == EX + "typed"][0]
    assert typed[5] == "http://www.w3.org/2001/XMLSchema#date"
    # anonymous bnode property list
    anon = [r for r in rows if r[0] == EX + "beta"][0]
    assert anon[3] == "bnode"
    bn = anon[2]
    assert (bn, RDFS + "label", "anon", "literal") in trip
    assert (bn, EX + "count", "7", "literal") in trip
    # collection expands to first/rest chain ending in nil
    head = [r for r in rows if r[1] == EX + "list"][0][2]
    firsts, rests, cur = [], [], head
    while cur != RDF_NIL:
        firsts.append([r for r in rows if r[0] == cur and r[1] == RDF_FIRST][0][2])
        cur = [r for r in rows if r[0] == cur and r[1] == RDF_REST][0][2]
    assert firsts == [EX + "alpha", "two", "3"]
    # named bnode subject
    assert ("_:b0", RDFS + "label", "named bnode", "literal") in trip


def test_parse_turtle_errors():
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("<http://a> <http://b> <http://c>")  # missing '.'
    with pytest.raises(TurtleSyntaxError):
        parse_turtle("foo:bar <http://p> <http://o> .")  # unknown prefix
    with pytest.raises(TurtleSyntaxError):
        parse_turtle('<http://a> <http://p> "unterminated .')


def test_integer_then_terminator():
    rows = parse_turtle(
        "@prefix : <http://ex.org/> .\n:a :n 123.\n:a :m 7 ."
    )
    vals = {(r[1], r[2]) for r in rows}
    assert ("http://ex.org/n", "123") in vals
    assert ("http://ex.org/m", "7") in vals
