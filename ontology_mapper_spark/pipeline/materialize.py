"""Stage 4 — graph materialization: triples / nodes / edges (+ metrics).

Triple vocabulary reproduces /root/reference/core/generator.py:243-295 per
selected (concept, alignment):

  (local, <C1-predicate>, external)                 mapping triple
  (local, skos:inScheme,  bioportal-ontology IRI)
  (local, dcterms:source, bioportal-ontology IRI)
  (local, skos:prefLabel, label@en)                 if non-blank
  (local, dcterms:description, cleaned@en)          if cleaning non-empty
  (local, skos:altLabel, syn@en) ×≤3                D3-deduped, (len,lower)-sorted

where local = http://example.org/ontology#<concept_key>. Predicates are
stored as CURIEs (skos:/dcterms:/rdfs:) — compact at 10^12-triple scale;
the NT sink expands them.

Provenance differs deliberately from the reference: its per-alignment
counter and datetime.now() (core/generator.py:287-291) are
nondeterministic under parallelism, so the prov node id is a deterministic
hash of (concept_key, class_iri) and the timestamp is the run's `run_ts`
parameter (SURVEY.md §7.3 determinism note).

Everything is one `explode(array(struct...))` over the links table — a
map-only stage; `dropDuplicates` at the end mirrors the RDF graph's set
semantics (rdflib.Graph cannot hold duplicate triples), and is the only
shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import clean_description_col
from ..functions.synonyms import top_synonyms_col

LOCAL_NS = "http://example.org/ontology#"
BP_ONT_NS = "http://bioportal.bioontology.org/ontologies/"

TRIPLE_COLS = ("subj", "pred", "obj", "obj_type", "lang")


def extract_triples(links: DataFrame, run_ts: str | None = None) -> DataFrame:
    """links (from link_score.link_mentions, optionally with a `description`
    column from the dictionary) → triples(subj, pred, obj, obj_type, lang)."""
    has_desc = "description" in links.columns
    desc_col = F.col("description") if has_desc else F.lit(None).cast("string")

    local = F.concat(F.lit(LOCAL_NS), F.col("concept_key"))
    ont_iri = F.concat(F.lit(BP_ONT_NS), F.col("ontology"))
    cleaned = clean_description_col(desc_col)

    def t(pred, obj, obj_type, lang=None):
        return F.struct(
            pred.alias("pred"),
            obj.alias("obj"),
            F.lit(obj_type).alias("obj_type"),
            (F.lit(lang) if lang else F.lit(None)).cast("string").alias("lang"),
        )

    base = F.array(
        t(F.col("predicate"), F.col("class_iri"), "uri"),
        t(F.lit("skos:inScheme"), ont_iri, "uri"),
        t(F.lit("dcterms:source"), ont_iri, "uri"),
    )
    with_label = F.when(
        F.trim(F.coalesce(F.col("label"), F.lit(""))) != "",
        F.concat(base, F.array(t(F.lit("skos:prefLabel"), F.col("label"), "literal", "en"))),
    ).otherwise(base)
    with_desc = F.when(
        cleaned != "",
        F.concat(
            with_label,
            F.array(t(F.lit("dcterms:description"), cleaned, "literal", "en")),
        ),
    ).otherwise(with_label)
    alt = F.transform(
        top_synonyms_col(F.col("synonyms"), 3),
        lambda s: t(F.lit("skos:altLabel"), s, "literal", "en"),
    )
    all_triples = F.concat(with_desc, alt)

    out = (
        links.select(local.alias("subj"), F.explode(all_triples).alias("t"))
        .select(
            "subj",
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.obj_type").alias("obj_type"),
            F.col("t.lang").alias("lang"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )
    if run_ts is not None:
        prov = (
            links.select(local.alias("lsubj"), "class_iri").distinct()
            .select(
                F.concat(
                    F.lit(LOCAL_NS),
                    F.lit("alignment_"),
                    F.sha2(F.concat_ws("|", "lsubj", "class_iri"), 256).substr(1, 16),
                ).alias("subj"),
                F.lit("dcterms:created").alias("pred"),
                F.lit(run_ts).alias("obj"),
                F.lit("literal").alias("obj_type"),
                F.lit(None).cast("string").alias("lang"),
            )
        )
        out = out.unionByName(prov)
    return out


def materialize_graph(
    links: DataFrame,
    comentions: DataFrame,
    canonical: DataFrame,
    out_dir: str,
    run_ts: str | None = None,
) -> dict[str, str]:
    """Write triples/nodes/edges (+_metrics) as partitioned parquet.

    Layout (Iceberg-like; SURVEY.md §7.1 step 7 parquet fallback):
      triples/  partitioned by pred_group (mapping vs metadata) — pred has
                ~8 distinct values; partitioning by it prunes the dominant
                access pattern (mapping-only scans) for free
      nodes/    canonical entities with degree stats
      edges/    co-mention edges
      _metrics/ per-partition lineage rows (north_rule)
    """
    triples = extract_triples(links, run_ts=run_ts)
    canon_links = links.join(F.broadcast(canonical), "class_iri", "left").withColumn(
        "entity_id", F.coalesce("canonical_iri", "class_iri")
    )

    nodes = (
        canon_links.groupBy("entity_id")
        .agg(
            F.count("*").alias("n_mentions"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.min("label").alias("any_label"),
        )
    )

    paths = {}
    for name, df, parts in (
        ("triples", triples.withColumn(
            "pred_group",
            F.when(F.col("pred").startswith("skos:") & F.col("pred").endswith("Match"), "mapping")
            .otherwise("metadata"),
        ), ["pred_group"]),
        ("nodes", nodes, None),
        ("edges", comentions, None),
    ):
        path = os.path.join(out_dir, name)
        writer = df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        paths[name] = path

    # per-partition lineage + metrics rows (north_rule)
    metrics = (
        links.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("n_links"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.approx_count_distinct("class_iri").alias("n_classes"),
        )
        .withColumn("stage", F.lit("materialize"))
        .withColumn("run_ts", F.lit(run_ts))
    )
    mpath = os.path.join(out_dir, "_metrics")
    metrics.write.mode("append").parquet(mpath)
    paths["_metrics"] = mpath
    return paths
