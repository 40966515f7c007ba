"""Selections-path parity: spark triples vs the verbatim-oracle goldens
(the reference's test_integration_formats.py mock-selection idiom)."""

from __future__ import annotations

import json

from ontology_mapper_spark.oracle import semantics as ref
from ontology_mapper_spark.pipeline.from_selections import triples_from_selections
from ontology_mapper_spark.pipeline.materialize import LOCAL_NS
from ontology_mapper_spark.sources import read_selections_json

SELECTIONS = {
    "long_covid": [
        {
            "uri": "http://purl.obolibrary.org/obo/MONDO_0100233",
            "label": "long COVID-19",
            "ontology": "MONDO",
            "description": "A The persistent condition   after covid" + " infection" * 40,
            "synonyms": ["Long COVID", "post-COVID syndrome", "x", "long covid"],
            "source": "bioportal",
            "relationship": "skos:relatedMatch",  # ignored: C1 reclassifies
        },
        {
            "uri": "http://purl.obolibrary.org/obo/NCIT_C171133",
            "label": "Post-Acute COVID-19 Syndrome",
            "ontology": "NCIT",
            "description": "",
            "synonyms": [],
            "source": "ols",
        },
    ],
    "symptom": [
        {
            "uri": "http://ex/disease1",
            "label": "some disease thing",
            "ontology": "HP",
            "description": "Definition: a broader thing",
            "synonyms": [],
            "source": "bioportal",
        }
    ],
    "fatigue": [
        {
            "uri": "http://ex/f1",
            "label": "fatigue",
            "ontology": "HP",
            "description": "The tired state",
            "synonyms": ["tiredness", "TIREDNESS", "ab"],
            "source": "bioportal",
        }
    ],
}


def test_mapping_triples_match_golden(spark, tmp_path):
    p = tmp_path / "sel.json"
    p.write_text(json.dumps(SELECTIONS))
    sel = read_selections_json(spark, str(p))
    triples = triples_from_selections(sel)
    mapping = {
        (r.subj, r.pred, r.obj)
        for r in triples.collect()
        if r.pred.endswith("Match") or r.pred == "rdfs:seeAlso"
    }
    golden = ref.golden_mappings(SELECTIONS)
    assert mapping == golden
    # C1 semantics spot checks: exact label → exactMatch; synonym-case hit
    # still exact; 'disease' label with key='symptom' → broadMatch
    assert (f"{LOCAL_NS}fatigue", "skos:exactMatch", "http://ex/f1") in mapping
    assert (f"{LOCAL_NS}symptom", "skos:broadMatch", "http://ex/disease1") in mapping


def test_metadata_triples(spark, tmp_path):
    p = tmp_path / "sel.json"
    p.write_text(json.dumps(SELECTIONS))
    sel = read_selections_json(spark, str(p))
    got = {
        (r.subj, r.pred, r.obj, r.lang)
        for r in triples_from_selections(sel).collect()
    }
    lc = f"{LOCAL_NS}long_covid"
    # inScheme + source per alignment ontology
    assert (lc, "skos:inScheme",
            "http://bioportal.bioontology.org/ontologies/MONDO", None) in got
    assert (lc, "dcterms:source",
            "http://bioportal.bioontology.org/ontologies/NCIT", None) in got
    # prefLabel@en
    assert (lc, "skos:prefLabel", "long COVID-19", "en") in got
    # description cleaned per P4: stock prefix stripped once, squeezed,
    # capitalized, truncated at 197+'...'
    descs = [o for (s, pr, o, _l) in got if s == lc and pr == "dcterms:description"]
    assert len(descs) == 1
    d = descs[0]
    assert d.startswith("The persistent condition after covid")
    assert d.endswith("...") and len(d) == 200
    # altLabels: D3 dedup (case-insensitive first-wins, <3 dropped),
    # (len,lower) sort, top-3
    alts = sorted(o for (s, pr, o, _l) in got if s == lc and pr == "skos:altLabel")
    expected = ref.dedupe_synonyms(
        ["Long COVID", "post-COVID syndrome", "x", "long covid"], set()
    )[:3]
    assert sorted(alts) == sorted(expected)
    # empty-description alignment contributes no description triple for NCIT
    # (but long_covid still has the MONDO one) — and 'fatigue' has its own
    f = f"{LOCAL_NS}fatigue"
    fd = [o for (s, pr, o, _l) in got if s == f and pr == "dcterms:description"]
    assert fd == ["Tired state"]  # 'The ' prefix stripped then capitalized
