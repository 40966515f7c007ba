"""Sources (SURVEY.md S1-S6).

S1 — RDF scan. The reference parses 7 RDF formats through rdflib into an
in-memory graph (core/parser.py:105-133); the format table and extension
detection mirror core/parser.py:11-27,61-93. At cluster scale the only
format worth a distributed scan is N-Triples (line = statement); the
block-structured formats (turtle, json-ld, rdf/xml, trig, n3) are
config-sized inputs parsed on the driver when rdflib is available, else
rejected with a clear error (this sandbox has no rdflib — SURVEY.md env
facts). The engine's primary triple source is the parquet `triples` table.

S5/S6 — batch selections JSON and one-term-per-line concept lists
(cli/interface.py:473-480, examples/batch_processing.py:21-22).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → canonical format name (core/parser.py:11-27); unknown → None
SUPPORTED_INPUT_FORMATS: dict[str, str] = {
    ".ttl": "turtle",
    ".turtle": "turtle",
    ".nt": "nt",
    ".ntriples": "nt",
    ".n3": "n3",
    ".xml": "xml",
    ".rdf": "xml",
    ".owl": "xml",
    ".jsonld": "json-ld",
    ".json-ld": "json-ld",
    ".trig": "trig",
    ".nq": "nquads",
    ".nquads": "nquads",
}


def detect_format(path: str) -> str | None:
    """Extension-based format detection with explicit-override semantics
    left to the caller (core/parser.py:61-93)."""
    _, ext = os.path.splitext(path.lower())
    return SUPPORTED_INPUT_FORMATS.get(ext)


# One N-Triples statement: <s> <p> <o>|"o"[@lang|^^<dt>] .
_NT_RE = (
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<[^>]*>)?)\s*\.\s*$'
)

# N-Quads: the same statement with an optional graph IRI as 4th term.
_NQ_RE = (
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<[^>]*>)?)'
    r'(?:\s+<([^>]*)>)?\s*\.\s*$'
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed N-Triples scan → (subj, pred, obj, obj_type, lang).

    spark.read.text + one regexp per line (NT is line-oriented, so the
    scan parallelizes over file splits like any text source). Comment and
    blank lines are dropped; malformed lines are surfaced in a `_corrupt`
    column convention: they come back with NULL subj and the raw line kept,
    so callers can count/quarantine instead of silently dropping.
    """
    lines = spark.read.text(path)
    parsed = lines.select(
        F.col("value"),
        F.regexp_extract("value", _NT_RE, 1).alias("s"),
        F.regexp_extract("value", _NT_RE, 2).alias("p"),
        F.regexp_extract("value", _NT_RE, 3).alias("o_uri"),
        F.regexp_extract("value", _NT_RE, 4).alias("o_lit"),
        F.regexp_extract("value", _NT_RE, 5).alias("o_lang"),
    )
    content = parsed.where(
        (F.trim("value") != "") & ~F.trim(F.col("value")).startswith("#")
    )

    def unescape(c):
        # Escape decoding must be one left-to-right pass: take escaped
        # backslashes out of play FIRST (sentinel) so the source sequence
        # \\n (escaped backslash, then 'n') decodes to backslash+'n', not
        # backslash+newline. NUL is illegal in N-Triples, so it is a safe
        # sentinel.
        out = F.regexp_replace(c, r"\\\\", "\x00")
        out = F.regexp_replace(out, r"\\t", "\t")
        out = F.regexp_replace(out, r"\\r", "\r")
        out = F.regexp_replace(out, r"\\n", "\n")
        out = F.regexp_replace(out, r'\\"', '"')
        out = F.regexp_replace(out, "\x00", "\\\\")
        return out

    return content.select(
        F.when(F.col("s") != "", F.col("s")).alias("subj"),
        F.when(F.col("p") != "", F.col("p")).alias("pred"),
        F.when(F.col("o_uri") != "", F.col("o_uri"))
        .otherwise(unescape(F.col("o_lit")))
        .alias("obj"),
        F.when(F.col("o_uri") != "", F.lit("uri")).otherwise(F.lit("literal")).alias(
            "obj_type"
        ),
        F.when(F.col("o_lang") != "", F.col("o_lang")).alias("lang"),
        F.col("value").alias("_raw"),
    ).withColumn("_corrupt", F.col("subj").isNull())


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Distributed N-Quads scan → (subj, pred, obj, obj_type, lang, graph).

    Same split-parallel line scan as read_ntriples; the optional 4th term
    lands in `graph` (NULL for default-graph statements, so every valid
    N-Triples file also reads as N-Quads)."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.col("value"),
        F.regexp_extract("value", _NQ_RE, 1).alias("s"),
        F.regexp_extract("value", _NQ_RE, 2).alias("p"),
        F.regexp_extract("value", _NQ_RE, 3).alias("o_uri"),
        F.regexp_extract("value", _NQ_RE, 4).alias("o_lit"),
        F.regexp_extract("value", _NQ_RE, 5).alias("o_lang"),
        F.regexp_extract("value", _NQ_RE, 6).alias("g"),
    )
    content = parsed.where(
        (F.trim("value") != "") & ~F.trim(F.col("value")).startswith("#")
    )

    def unescape(c):
        out = F.regexp_replace(c, r"\\\\", "\x00")
        out = F.regexp_replace(out, r"\\t", "\t")
        out = F.regexp_replace(out, r"\\r", "\r")
        out = F.regexp_replace(out, r"\\n", "\n")
        out = F.regexp_replace(out, r'\\"', '"')
        out = F.regexp_replace(out, "\x00", "\\\\")
        return out

    return content.select(
        F.when(F.col("s") != "", F.col("s")).alias("subj"),
        F.when(F.col("p") != "", F.col("p")).alias("pred"),
        F.when(F.col("o_uri") != "", F.col("o_uri"))
        .otherwise(unescape(F.col("o_lit")))
        .alias("obj"),
        F.when(F.col("o_uri") != "", F.lit("uri")).otherwise(F.lit("literal")).alias(
            "obj_type"
        ),
        F.when(F.col("o_lang") != "", F.col("o_lang")).alias("lang"),
        F.when(F.col("g") != "", F.col("g")).alias("graph"),
        F.col("value").alias("_raw"),
    ).withColumn("_corrupt", F.col("subj").isNull())


def read_rdf(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Format-dispatched RDF read (core/parser.py:61-133 analogue).

    N-Triples scans distributed (line = statement); Turtle/N3 parse on the
    driver through the vendored subset grammar (sources/turtle.py) exactly
    as the reference's rdflib load is whole-document in-memory. The block
    formats with no parser here (RDF/XML, JSON-LD, TriG) fail with a clear
    error instead of silently mis-parsing.
    """
    fmt = fmt or detect_format(path)
    if fmt == "nt":
        return read_ntriples(spark, path)
    if fmt == "nquads":
        return read_nquads(spark, path)
    if fmt in ("turtle", "n3"):
        from .turtle import read_turtle

        return read_turtle(spark, path)
    if fmt == "trig":
        from .turtle import read_trig

        return read_trig(spark, path)
    if fmt == "xml":
        from .rdfxml import read_rdfxml

        return read_rdfxml(spark, path)
    if fmt == "json-ld":
        from .jsonld import read_jsonld

        return read_jsonld(spark, path)
    raise NotImplementedError(
        f"RDF format {fmt!r} has no parser "
        "(supported: nt/nquads distributed; turtle/n3/trig/xml/json-ld "
        "driver-side)"
    )


def read_selections_json(spark: SparkSession, path: str) -> DataFrame:
    """S5: batch selections {concept_key: [alignment...]} → one row per
    (concept_key, alignment) — the explode that replaces the reference's
    interactive loop (cli/interface.py:473-480)."""
    import json

    with open(path) as fh:  # config-sized by contract
        data = json.load(fh)
    rows = []
    for key, alignments in data.items():
        for al in alignments:
            rows.append(
                (
                    key,
                    al.get("uri", ""),
                    al.get("label", ""),
                    al.get("ontology", ""),
                    al.get("description", ""),
                    list(al.get("synonyms", []) or []),
                    al.get("source", ""),
                    al.get("relationship"),
                )
            )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("concept_key", T.StringType(), False),
            T.StructField("uri", T.StringType(), False),
            T.StructField("label", T.StringType(), True),
            T.StructField("ontology", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
            T.StructField("synonyms", T.ArrayType(T.StringType()), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("relationship", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def read_concept_list(spark: SparkSession, path: str) -> DataFrame:
    """S6: one concept per line → (concept_key, label) with the
    reference's key↔label derivation (cli/interface.py:361-366)."""
    lines = spark.read.text(path)
    key = F.translate(F.trim("value"), " ", "_")
    return lines.where(F.trim("value") != "").select(
        key.alias("concept_key"),
        F.translate(key, "_", " ").alias("label"),
    )
