"""Ontology-graph concept extraction (reference §3.2 step 2).

`OntologyParser.parse()` (/root/reference/core/parser.py:105-133) walks an
rdflib graph extracting class and instance concepts; here the same
composition runs over a `triples` DataFrame:

* classes:  subjects of (s, rdf:type, rdfs:Class), fragment != 'Entity'
  (F1+F2+P1);
* instances: (s, rdf:type, o) where o starts with the local namespace AND
  o's fragment is an extracted class (F3 + J4 left-semi);
* labels: fragment with underscores→spaces (P2);
* priority concepts: the fixed instance/class name lists
  (core/parser.py:140-160, F4).

Predicates may appear as CURIEs or full IRIs — both accepted, matching
the sink convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.keys import label_from_key_col, uri_fragment_col

RDF_TYPE = ("rdf:type", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
RDFS_CLASS = ("rdfs:Class", "http://www.w3.org/2000/01/rdf-schema#Class")
LOCAL_NS = "http://example.org/ontology#"

PRIORITY_INSTANCES = ("long_covid", "fatigue", "immune_dysfunction")
PRIORITY_CLASSES = (
    "Disease", "Symptom", "BiologicalProcess", "MolecularEntity", "Treatment",
)


def extract_classes(triples: DataFrame) -> DataFrame:
    """(class_name) — F1/F2/P1."""
    return (
        triples.where(
            F.col("pred").isin(*RDF_TYPE) & F.col("obj").isin(*RDFS_CLASS)
        )
        .select(uri_fragment_col(F.col("subj")).alias("class_name"))
        .where(F.col("class_name") != "Entity")
        .distinct()
    )


def extract_concepts(triples: DataFrame, ns: str = LOCAL_NS) -> DataFrame:
    """(key, label, type, category) concept records (core/parser.py:122-126
    shape): one row per extracted class plus one per instance whose class
    is in the extracted set."""
    classes = extract_classes(triples)

    class_concepts = classes.select(
        F.col("class_name").alias("key"),
        label_from_key_col(F.col("class_name")).alias("label"),
        F.col("class_name").alias("type"),
        F.lit("class").alias("category"),
    )

    inst = (
        triples.where(
            F.col("pred").isin(*RDF_TYPE) & F.col("obj").startswith(ns)
        )
        .select(
            uri_fragment_col(F.col("subj")).alias("key"),
            uri_fragment_col(F.col("obj")).alias("class_name"),
        )
        .join(classes, "class_name", "left_semi")  # J4
        .distinct()
    )
    inst_concepts = inst.select(
        "key",
        label_from_key_col(F.col("key")).alias("label"),
        F.col("class_name").alias("type"),
        F.lit("instance").alias("category"),
    )
    return class_concepts.unionByName(inst_concepts)


def priority_concepts(concepts: DataFrame) -> DataFrame:
    """F4 priority filter (core/parser.py:140-158): named instances first,
    then named classes."""
    return concepts.where(
        ((F.col("category") == "instance") & F.col("key").isin(*PRIORITY_INSTANCES))
        | ((F.col("category") == "class") & F.col("key").isin(*PRIORITY_CLASSES))
    )
