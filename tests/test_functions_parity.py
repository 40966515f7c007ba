"""Spark Column expressions must agree bit-exactly with the pure-Python
oracle on adversarial inputs — this is what makes the P/R gate reachable."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ontology_mapper_spark.functions import (
    alignment_predicate_col,
    alignment_type_col,
    cache_key_col,
    clean_description_col,
    curie_to_iri_col,
    norm_label_col,
)
from ontology_mapper_spark.oracle import semantics as S

DESCRIPTIONS = [
    None,
    "",
    "   ",
    "a",
    "A ",
    "An apple a day",
    "The    quick   brown\tfox",
    "This is a test description",
    "This is an odd one",
    "This is the last prefix",
    "Definition: something formal",
    "Description: another thing",
    "A The cat",
    "The A cat",
    "an uncapitalized non-prefix",  # 'an ' lowercase is NOT a stock prefix
    "x" * 200,
    "x" * 201,
    "A " + "y" * 250,
    "Ärzte behandeln Patienten",  # unicode first char
    "  Definition:    spaced   out  ",
    "AB",
    "This is a " + "z" * 300,
]

ALIGN_CASES = [
    # (label, synonyms, concept_key)
    ("Long Covid", [], "long_covid"),
    ("PASC", ["Long COVID", "pasc"], "long_covid"),
    ("chronic fatigue", [], "fatigue"),
    ("fat", [], "fatigue"),
    ("", [], "fatigue"),
    (None, None, "fatigue"),
    ("rare disease", [], "Symptom"),
    ("heart condition", [], "sign"),
    ("clinical manifestation", [], "Disease"),
    ("some sign of illness", [], "disorder"),
    ("zebrafish", [], "fatigue"),
    ("disease", [], "Disease"),  # exact beats narrower-indicators
    ("immune dysfunction", [], "immune_dysfunction"),
    ("Immune Dysfunction", ["immune dysfunction"], "immune_dysfunction"),
    ("syndrome x", ["FATIGUE"], "fatigue"),  # synonym exact via case-fold
    ("a", [], "a"),
    ("_", [], "_"),
    ("under score", [], "under_score"),
]


def test_clean_description_parity(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DESCRIPTIONS)], "i int, d string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", clean_description_col(F.col("d")).alias("out")).collect()
    }
    for i, d in enumerate(DESCRIPTIONS):
        assert got[i] == S.clean_description(d), f"case {i}: {d!r}"


def test_alignment_type_parity(spark):
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("label", T.StringType()),
            T.StructField("synonyms", T.ArrayType(T.StringType())),
            T.StructField("key", T.StringType()),
        ]
    )
    rows = [(i, l, s, k) for i, (l, s, k) in enumerate(ALIGN_CASES)]
    df = spark.createDataFrame(rows, schema)
    out = df.select(
        "i",
        alignment_type_col(F.col("label"), F.col("synonyms"), F.col("key")).alias("t"),
        alignment_predicate_col(F.col("label"), F.col("synonyms"), F.col("key")).alias("p"),
    ).collect()
    for r in out:
        label, syns, key = ALIGN_CASES[r["i"]]
        assert r["t"] == S.alignment_type(label, syns, key), f"case {r['i']}"
        assert r["p"] == S.alignment_predicate(label, syns, key), f"case {r['i']}"


def test_cache_key_parity(spark):
    cases = [(" Fatigue ", "hp,ncit", "BioPortal"), ("x", "", "ols"), ("", "", "")]
    df = spark.createDataFrame(cases, "q string, o string, s string")
    got = [
        r["k"]
        for r in df.select(
            cache_key_col(F.col("q"), F.col("o"), F.col("s")).alias("k")
        ).collect()
    ]
    assert got == [S.cache_key(*c) for c in cases]


def test_curie_parity(spark):
    cases = ["MONDO:0005015", "HP:0012378", "FOO:1", "nocolon", "SIO:000123", "a:b:c"]
    df = spark.createDataFrame([(c,) for c in cases], "c string")
    got = [r["iri"] for r in df.select(curie_to_iri_col(F.col("c")).alias("iri")).collect()]
    assert got == [S.curie_to_iri(c) for c in cases]


def test_norm_label(spark):
    df = spark.createDataFrame([("  MiXeD  ",)], "x string")
    assert df.select(norm_label_col(F.col("x")).alias("n")).first()["n"] == "mixed"
