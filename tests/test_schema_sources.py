"""Schema-mode source tests (S2-S4) — fixtures shaped like the reference's
test_schema.yaml (Person/Patient with NCIT mappings)."""

from __future__ import annotations

import json

from ontology_mapper_spark.sources.schema import (
    concepts_for_mapping,
    read_schema_classes,
    schema_to_triples,
)

YAML_DOC = """
metadata:
  name: Test Schema
  version: '1.0'

classes:
  Person:
    definition: A human being
    properties:
      - person_id
      - name
    ontology_mappings:
      - curie: NCIT:C25190
        iri: http://purl.obolibrary.org/obo/NCIT_C25190
        prefix: NCIT
  Patient:
    definition: An individual receiving healthcare
    ontology_mappings:
      - NCIT:C16960
  Unmapped:
    definition: No mappings here
"""

MD_DOC = """# Schema

### Person
Definition: A human being
**Ontology Mappings**: (http://purl.obolibrary.org/obo/NCIT_C25190);

### Patient
Definition: An individual receiving healthcare
"""


def test_yaml_schema(spark, tmp_path):
    p = tmp_path / "s.yaml"
    p.write_text(YAML_DOC)
    df = read_schema_classes(spark, str(p))
    rows = {r.name: r for r in df.collect()}
    assert set(rows) == {"Person", "Patient", "Unmapped"}
    assert rows["Person"].properties == ["person_id", "name"]
    m = rows["Person"].ontology_mappings[0]
    assert (m.curie, m.iri, m.prefix) == (
        "NCIT:C25190", "http://purl.obolibrary.org/obo/NCIT_C25190", "NCIT"
    )
    # string-only CURIE entry expands via the 8-prefix map
    m2 = rows["Patient"].ontology_mappings[0]
    assert m2.iri == "http://purl.obolibrary.org/obo/NCIT_C16960"
    assert m2.prefix == "NCIT"


def test_json_schema_equivalent(spark, tmp_path):
    import yaml

    data = yaml.safe_load(YAML_DOC)
    p = tmp_path / "s.json"
    p.write_text(json.dumps(data))
    df = read_schema_classes(spark, str(p))
    assert df.count() == 3


def test_markdown_schema(spark, tmp_path):
    p = tmp_path / "s.md"
    p.write_text(MD_DOC)
    rows = {r.name: r for r in read_schema_classes(spark, str(p)).collect()}
    assert set(rows) == {"Person", "Patient"}
    assert rows["Person"].definition == "A human being"
    # IRI regex strips the trailing ');' (core/schema_parser.py:178-182)
    assert rows["Person"].ontology_mappings[0].iri == (
        "http://purl.obolibrary.org/obo/NCIT_C25190"
    )


def test_concepts_filter_and_triples(spark, tmp_path):
    p = tmp_path / "s.yaml"
    p.write_text(YAML_DOC)
    classes = read_schema_classes(spark, str(p))
    concepts = concepts_for_mapping(classes)
    # F9: Unmapped has no ontology_mappings → excluded
    assert {r.key for r in concepts.collect()} == {"Person", "Patient"}

    triples = schema_to_triples(classes)
    got = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    ns = "http://example.org/schema#"
    assert (f"{ns}Person", "rdf:type", "owl:Class") in got
    assert (f"{ns}Person", "rdfs:label", "Person") in got
    assert (f"{ns}Person", "skos:definition", "A human being") in got
    assert (
        f"{ns}Person", "skos:exactMatch",
        "http://purl.obolibrary.org/obo/NCIT_C25190",
    ) in got
    # Unmapped still gets class+label+definition triples, no exactMatch
    assert (f"{ns}Unmapped", "rdf:type", "owl:Class") in got
    assert not any(
        s == f"{ns}Unmapped" and p == "skos:exactMatch" for s, p, _ in got
    )
