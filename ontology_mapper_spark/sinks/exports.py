"""Graph export sinks (SURVEY.md K1-K3).

The reference serializes its rdflib graph to 7 RDF formats plus CSV/TSV
and SSSOM (core/generator.py:94-185). At 10^12-triple scale the PRIMARY
representation is the partitioned `triples` table itself; exports are
derived, line-oriented projections:

* K1 — N-Triples (the only RDF format that is line-per-triple and thus
  embarrassingly parallel to write; turtle/json-ld/xml need whole-document
  state and are driver-side conveniences for small graphs, not cluster
  sinks). Format map parity: core/generator.py:19-39.
* K2 — CSV/TSV with the reference's exact 4 columns
  `Subject, Predicate, Object, Object Type` where Object Type is
  'URI' | 'Literal' (core/generator.py:106-119).
* K3 — SSSOM TSV: filter to the 6 mapping predicates, join subject/object
  labels (prefLabel preferred over label — core/generator.py:121-139),
  emit the 7 SSSOM columns (core/generator.py:141-185).

Predicates are stored as CURIEs in the table; sinks expand them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CURIE_EXPANSIONS: dict[str, str] = {
    "skos:": "http://www.w3.org/2004/02/skos/core#",
    "dcterms:": "http://purl.org/dc/terms/",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "prov:": "http://www.w3.org/ns/prov#",
}

# The six mapping predicates of the SSSOM sink (core/generator.py:147-148).
MAPPING_PREDICATES = (
    "skos:exactMatch", "skos:closeMatch", "skos:relatedMatch",
    "skos:broadMatch", "skos:narrowMatch", "rdfs:seeAlso",
)


def expand_curie_col(pred: Column) -> Column:
    """CURIE → full IRI for the known vocabularies; passthrough otherwise."""
    out = pred
    for prefix, ns in CURIE_EXPANSIONS.items():
        out = F.when(
            pred.startswith(prefix),
            F.concat(F.lit(ns), F.substring(pred, len(prefix) + 1, 2_000_000)),
        ).otherwise(out)
    return out


def _nt_escape(c: Column) -> Column:
    """N-Triples literal escaping: backslash, quote, newline, tab, CR."""
    out = F.regexp_replace(c, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    out = F.regexp_replace(out, "\t", "\\\\t")
    return out


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """(line: string) — one N-Triples statement per row; map-only."""
    subj = F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    pred = F.concat(F.lit("<"), expand_curie_col(F.col("pred")), F.lit(">"))
    obj_uri = F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    lang_suffix = F.when(
        F.col("lang").isNotNull(), F.concat(F.lit("@"), F.col("lang"))
    ).otherwise(F.lit(""))
    obj_lit = F.concat(F.lit('"'), _nt_escape(F.col("obj")), F.lit('"'), lang_suffix)
    obj = F.when(F.col("obj_type") == "uri", obj_uri).otherwise(obj_lit)
    return triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    to_ntriples_lines(triples).write.mode("overwrite").text(path)


def write_tabular(triples: DataFrame, path: str, sep: str = ",") -> None:
    """K2: header `Subject,Predicate,Object,Object Type`; URI/Literal tag
    exactly as core/generator.py:114-119."""
    out = triples.select(
        F.col("subj").alias("Subject"),
        expand_curie_col(F.col("pred")).alias("Predicate"),
        F.col("obj").alias("Object"),
        F.when(F.col("obj_type") == "uri", "URI").otherwise("Literal").alias(
            "Object Type"
        ),
    )
    out.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)


def _labels_table(triples: DataFrame) -> DataFrame:
    """(entity, best_label): skos:prefLabel preferred over rdfs:label,
    deterministic tiebreak on the label value (core/generator.py:121-139)."""
    labels = triples.where(
        F.col("pred").isin("skos:prefLabel", "rdfs:label")
        & (F.col("obj_type") == "literal")
    ).select(
        F.col("subj").alias("entity"),
        F.col("obj").alias("label"),
        F.when(F.col("pred") == "skos:prefLabel", 0).otherwise(1).alias("prio"),
    )
    w = Window.partitionBy("entity").orderBy("prio", "label")
    return (
        labels.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("entity", F.col("label").alias("best_label"))
    )


def sssom_rows(triples: DataFrame, mapping_date: str) -> DataFrame:
    """K3: the 7 SSSOM columns for every mapping triple.

    `mapping_date` is an explicit run parameter, NOT wall clock — the
    reference's datetime.now() (core/generator.py:175) is nondeterministic
    under parallelism (SURVEY.md §7.3).
    """
    mappings = triples.where(F.col("pred").isin(*MAPPING_PREDICATES))
    labels = _labels_table(triples)
    subj_l = labels.withColumnRenamed("entity", "subj").withColumnRenamed(
        "best_label", "subject_label"
    )
    obj_l = labels.withColumnRenamed("entity", "obj").withColumnRenamed(
        "best_label", "object_label"
    )
    return (
        mappings.join(subj_l, "subj", "left")
        .join(obj_l, "obj", "left")
        .select(
            F.col("subj").alias("subject_id"),
            F.coalesce("subject_label", F.lit("")).alias("subject_label"),
            F.col("pred").alias("predicate_id"),
            F.col("obj").alias("object_id"),
            F.coalesce("object_label", F.lit("")).alias("object_label"),
            F.lit("semapv:ManualMappingCuration").alias("mapping_justification"),
            F.lit(mapping_date).alias("mapping_date"),
        )
    )


def write_sssom(triples: DataFrame, path: str, mapping_date: str) -> None:
    sssom_rows(triples, mapping_date).write.mode("overwrite").option(
        "header", True
    ).option("sep", "\t").csv(path)


# Prefix table for compact Turtle output (mirrors the reference's bind
# calls, core/generator.py:229-239 / schema_parser.py:255-260).
TURTLE_PREFIXES = {
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "dcterms": "http://purl.org/dc/terms/",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
}


def _turtle_stmt_col() -> Column:
    """One Turtle statement as a Column over (subj, pred, obj, obj_type,
    lang) — predicates kept as CURIEs where known, <IRI> fallback."""
    pred = F.when(
        F.col("pred").rlike(r"^(skos|dcterms|rdfs|rdf|owl|prov):"), F.col("pred")
    ).otherwise(F.concat(F.lit("<"), expand_curie_col(F.col("pred")), F.lit(">")))
    subj = F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    lang_suffix = F.when(
        F.col("lang").isNotNull(), F.concat(F.lit("@"), F.col("lang"))
    ).otherwise(F.lit(""))
    obj = F.when(
        F.col("obj_type") == "uri", F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    ).otherwise(
        F.concat(F.lit('"'), _nt_escape(F.col("obj")), F.lit('"'), lang_suffix)
    )
    return F.concat_ws(" ", subj, pred, obj, F.lit("."))


def to_turtle_lines(triples: DataFrame) -> DataFrame:
    """(line) — Turtle statements using the prefix table where the
    predicate is a known CURIE (data rows only; the @prefix header comes
    from `turtle_header`). Every N-Triples statement is valid Turtle, so
    non-prefixed terms fall back to <IRI> form — line-oriented, hence
    cluster-writable, unlike pretty-printed block Turtle."""
    return triples.select(_turtle_stmt_col().alias("line"))


def turtle_header() -> str:
    return "\n".join(
        f"@prefix {p}: <{ns}> ." for p, ns in sorted(TURTLE_PREFIXES.items())
    )


def write_turtle(triples: DataFrame, path: str) -> None:
    """Data part as distributed text; the tiny @prefix header goes into a
    '_header.ttl' sidecar (a cluster sink can't prepend a single header to
    N parallel part files; consumers concatenate header + parts)."""
    import os

    to_turtle_lines(triples).write.mode("overwrite").text(path)
    with open(os.path.join(path, "_header.ttl"), "w") as fh:
        fh.write(turtle_header() + "\n")


def to_trig_lines(
    triples: DataFrame,
    graph_iri: str | None = None,
    graph_col: str | None = None,
) -> DataFrame:
    """(line) — TriG, one `<graph> { statement }` block per row. The TriG
    grammar merges repeated same-label blocks, so a block-per-statement
    layout is spec-valid AND line-oriented — i.e. cluster-writable, unlike
    pretty-printed grouped TriG. Statements without a graph (graph_iri
    None / NULL graph_col) emit as plain default-graph Turtle lines."""
    stmt = _turtle_stmt_col()
    if graph_col is not None:
        line = F.when(
            F.col(graph_col).isNotNull(),
            F.concat(F.lit("<"), F.col(graph_col), F.lit("> { "), stmt, F.lit(" }")),
        ).otherwise(stmt)
        return triples.select(line.alias("line"))
    if graph_iri:
        return triples.select(
            F.concat(F.lit(f"<{graph_iri}> {{ "), stmt, F.lit(" }")).alias("line")
        )
    return triples.select(stmt.alias("line"))


def write_trig(
    triples: DataFrame, path: str, graph_iri: str | None = None
) -> None:
    """Data lines distributed + the @prefix header in a '_header.trig'
    sidecar (same contract as write_turtle)."""
    import os

    to_trig_lines(triples, graph_iri=graph_iri).write.mode("overwrite").text(path)
    with open(os.path.join(path, "_header.trig"), "w") as fh:
        fh.write(turtle_header() + "\n")


def to_nquads_lines(triples: DataFrame, graph_iri: str | None = None) -> DataFrame:
    """(line) — N-Quads: the N-Triples statement plus an optional graph
    IRI (4th term)."""
    base = to_ntriples_lines(triples).select(
        F.regexp_replace("line", r" \.$", "").alias("stmt")
    )
    if graph_iri:
        return base.select(
            F.concat_ws(" ", F.col("stmt"), F.lit(f"<{graph_iri}>"), F.lit(".")).alias(
                "line"
            )
        )
    return base.select(F.concat_ws(" ", F.col("stmt"), F.lit(".")).alias("line"))


def write_nquads(triples: DataFrame, path: str, graph_iri: str | None = None) -> None:
    to_nquads_lines(triples, graph_iri).write.mode("overwrite").text(path)
