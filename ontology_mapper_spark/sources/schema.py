r"""Schema-mode sources (SURVEY.md S2-S4) — YAML/JSON/Markdown class files.

Schema files are config-sized (the reference walks them in-memory,
core/schema_parser.py:57-211), so parsing happens on the driver; the result
is a `schema_classes` DataFrame that joins into the distributed pipeline
(F9 has-mappings filter → concepts → linking), and `schema_to_triples`
reproduces `to_rdf_graph` (core/schema_parser.py:254-280): owl:Class +
rdfs:label@en + skos:definition@en + skos:exactMatch per mapping IRI.

Semantics mirrored bit-for-bit:
* dict entries keep curie/iri/prefix; string entries expand via the CURIE
  map with prefix = text before ':' (core/schema_parser.py:110-127);
* markdown: `###`/`- ` class headers, `**Ontology Mappings**:` IRI regex
  `http[s]?://[^\s;]+` with `);` rstrip, Definition:/Properties:/Relations:
  sections (core/schema_parser.py:131-211).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.semantics import curie_to_iri

SCHEMA_CLASS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("definition", T.StringType(), True),
        T.StructField("properties", T.ArrayType(T.StringType()), True),
        T.StructField("relations", T.ArrayType(T.StringType()), True),
        T.StructField("examples", T.ArrayType(T.StringType()), True),
        T.StructField(
            "ontology_mappings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("curie", T.StringType(), True),
                        T.StructField("iri", T.StringType(), True),
                        T.StructField("prefix", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def _process_class(name: str, info: dict) -> dict:
    """One class record (core/schema_parser.py:99-128)."""
    mappings = []
    for m in info.get("ontology_mappings", []) or []:
        if isinstance(m, dict):
            mappings.append(
                {
                    "curie": m.get("curie", ""),
                    "iri": m.get("iri", ""),
                    "prefix": m.get("prefix", ""),
                }
            )
        elif isinstance(m, str):
            mappings.append(
                {
                    "curie": m,
                    "iri": curie_to_iri(m),
                    "prefix": m.split(":")[0] if ":" in m else "",
                }
            )
    return {
        "name": name,
        "definition": info.get("definition", ""),
        "properties": list(info.get("properties", []) or []),
        "relations": list(info.get("relations", []) or []),
        "examples": list(info.get("examples", []) or []),
        "ontology_mappings": mappings,
    }


def _parse_mapping_dict(data: dict) -> list[dict]:
    classes = data.get("classes", {}) or {}
    return [_process_class(n, i or {}) for n, i in classes.items()]


_IRI_RE = re.compile(r"http[s]?://[^\s;]+")


def _parse_markdown(content: str) -> list[dict]:
    """Line-oriented state machine (core/schema_parser.py:131-211)."""
    classes: list[dict] = []
    current: dict | None = None
    section: str | None = None
    for line in content.split("\n"):
        stripped = line.strip()
        if stripped.startswith("###"):
            if current:
                classes.append(current)
            current = _process_class(line.replace("###", "").strip(), {})
            section = None
        elif stripped.startswith("- "):
            # faithful to the reference: ANY "- " line starts a new class,
            # even inside a Properties/Relations section — the later
            # section branches only catch "-x" bullets without a space
            # (core/schema_parser.py:156-170 ordering)
            if current:
                classes.append(current)
            current = _process_class(line.replace("-", "").strip(), {})
            section = None
        elif current is not None:
            if "**Ontology Mappings**:" in line:
                section = "mappings"
                for iri in _IRI_RE.findall(line):
                    current["ontology_mappings"].append(
                        {"curie": "", "iri": iri.rstrip(");"), "prefix": ""}
                    )
            elif "Definition:" in line:
                section = "definition"
                current["definition"] = line.split("Definition:")[-1].strip()
            elif "Examples:" in line:
                section = "examples"
                text = line.split("Examples:")[-1].strip()
                if text:
                    current["examples"].append(text)
            elif "Properties:" in line:
                section = "properties"
            elif "Relations:" in line:
                section = "relations"
            elif section == "properties" and stripped.startswith("-"):
                prop = stripped.lstrip("- ").strip()
                if prop:
                    current["properties"].append(prop)
            elif section == "relations" and stripped.startswith("-"):
                rel = stripped.lstrip("- ").strip()
                if rel and not rel.startswith("#"):
                    current["relations"].append(rel)
    if current:
        classes.append(current)
    return classes


def read_schema_classes(spark: SparkSession, path: str) -> DataFrame:
    """Dispatch on extension: .yaml/.yml → S2, .json → S3, .md → S4
    (core/schema_parser.py:41-55)."""
    ext = os.path.splitext(path.lower())[1]
    if ext in (".yaml", ".yml"):
        import yaml  # gated: baked into this sandbox; config-sized input

        with open(path, encoding="utf-8") as fh:
            rows = _parse_mapping_dict(yaml.safe_load(fh) or {})
    elif ext == ".json":
        with open(path, encoding="utf-8") as fh:
            rows = _parse_mapping_dict(json.load(fh))
    elif ext in (".md", ".markdown"):
        with open(path, encoding="utf-8") as fh:
            rows = _parse_markdown(fh.read())
    else:
        raise ValueError(f"unsupported schema format: {ext}")
    return spark.createDataFrame(rows, SCHEMA_CLASS_SCHEMA)


def concepts_for_mapping(classes: DataFrame) -> DataFrame:
    """F9: only classes that carry ontology mappings become concepts
    (core/schema_parser.py:235-252); key = name, label = name with
    underscores as spaces, category='schema_class'."""
    return classes.where(F.size("ontology_mappings") > 0).select(
        F.col("name").alias("key"),
        F.translate("name", "_", " ").alias("label"),
        F.lit("schema_class").alias("type"),
        F.lit("schema_class").alias("category"),
        "definition",
        "ontology_mappings",
    )


SCHEMA_NS = "http://example.org/schema#"


def schema_to_triples(classes: DataFrame) -> DataFrame:
    """to_rdf_graph as a DataFrame (core/schema_parser.py:254-280)."""
    uri = F.concat(F.lit(SCHEMA_NS), F.col("name"))

    base = classes.select(
        uri.alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("owl:Class").alias("obj"),
        F.lit("uri").alias("obj_type"),
        F.lit(None).cast("string").alias("lang"),
    ).unionByName(
        classes.select(
            uri.alias("subj"),
            F.lit("rdfs:label").alias("pred"),
            F.col("name").alias("obj"),
            F.lit("literal").alias("obj_type"),
            F.lit("en").alias("lang"),
        )
    )
    defs = classes.where(
        F.col("definition").isNotNull() & (F.col("definition") != "")
    ).select(
        uri.alias("subj"),
        F.lit("skos:definition").alias("pred"),
        F.col("definition").alias("obj"),
        F.lit("literal").alias("obj_type"),
        F.lit("en").alias("lang"),
    )
    maps = (
        classes.select(uri.alias("subj"), F.explode("ontology_mappings").alias("m"))
        .where(F.col("m.iri") != "")
        .select(
            "subj",
            F.lit("skos:exactMatch").alias("pred"),
            F.col("m.iri").alias("obj"),
            F.lit("uri").alias("obj_type"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    return base.unionByName(defs).unionByName(maps)
