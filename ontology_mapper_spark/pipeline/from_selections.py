"""Batch-selections path: the reference's file/schema enrichment flow
(§3.2/§3.3) as one distributed job.

The reference's batch mode replaces interactive choice with a selections
JSON (cli/interface.py:473-480) and then emits, per (concept, alignment),
the C1-classified mapping triple plus metadata triples
(core/generator.py:243-295). Here that is: selections DataFrame →
native C1 classification → the SAME extract_triples operator the
transcript pipeline uses (J6 key-group fan-out = explode inside it).

Note the reference classifies fresh with determine_alignment_type even
when the selection row carries a `relationship` field
(core/generator.py:250) — mirrored here by ignoring that column for the
mapping predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.align import alignment_predicate_col, alignment_type_col
from .materialize import extract_triples


def triples_from_selections(selections: DataFrame, run_ts: str | None = None) -> DataFrame:
    """selections(concept_key, uri, label, ontology, description, synonyms,
    source[, relationship]) → triples(subj, pred, obj, obj_type, lang)."""
    prepared = (
        selections.withColumn("class_iri", F.col("uri"))
        .withColumn(
            "alignment",
            alignment_type_col(F.col("label"), F.col("synonyms"), F.col("concept_key")),
        )
        .withColumn(
            "predicate",
            alignment_predicate_col(
                F.col("label"), F.col("synonyms"), F.col("concept_key")
            ),
        )
    )
    return extract_triples(prepared, run_ts=run_ts)
