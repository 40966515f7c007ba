"""The C1 classifier (`determine_alignment_type`) as a native when/otherwise
chain — the single most correctness-critical expression in the engine: it
decides the predicate of every emitted mapping triple (P/R gate).

Mirrors /root/reference/utils/helpers.py:76-105 bit-exactly; parity with
oracle.semantics.alignment_type is asserted in tests on adversarial cases
(empty labels, case variants, substring overlaps, synonym hits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BROADER_RE = "(disease|disorder|condition|syndrome)"
_NARROWER_RE = "(symptom|sign|manifestation)"


def alignment_type_col(label: Column, synonyms: Column, concept_key: Column) -> Column:
    """Alignment class for (candidate label, candidate synonyms, concept key).

    * exact:  lower(label) == lower(replace(key,'_',' ')), or that concept
      label appears verbatim in the lowered synonym list;
    * close:  substring containment in either direction (note: an empty
      label is contained in everything -> 'close', as in the reference);
    * broader/narrower: indicator words vs a fixed key set;
    * related otherwise.
    """
    label_l = F.lower(F.coalesce(label, F.lit("")))
    concept_label = F.lower(F.translate(concept_key, "_", " "))
    key_l = F.lower(concept_key)
    syn_l = F.transform(
        F.coalesce(synonyms, F.array().cast("array<string>")),
        lambda s: F.lower(F.coalesce(s, F.lit(""))),
    )

    return (
        F.when(label_l == concept_label, F.lit("exact"))
        .when(F.array_contains(syn_l, concept_label), F.lit("exact"))
        .when(label_l.contains(concept_label) | concept_label.contains(label_l), F.lit("close"))
        .when(
            label_l.rlike(_BROADER_RE) & key_l.isin("symptom", "sign"),
            F.lit("broader"),
        )
        .when(
            label_l.rlike(_NARROWER_RE) & key_l.isin("disease", "disorder"),
            F.lit("narrower"),
        )
        .otherwise(F.lit("related"))
    )


def alignment_predicate_col(label: Column, synonyms: Column, concept_key: Column) -> Column:
    """Alignment class -> emitted predicate CURIE (core/generator.py:249-264)."""
    t = alignment_type_col(label, synonyms, concept_key)
    mapping = F.create_map(
        F.lit("exact"), F.lit("skos:exactMatch"),
        F.lit("close"), F.lit("skos:closeMatch"),
        F.lit("related"), F.lit("skos:relatedMatch"),
        F.lit("broader"), F.lit("skos:broadMatch"),
        F.lit("narrower"), F.lit("skos:narrowMatch"),
    )
    return F.coalesce(F.element_at(mapping, t), F.lit("rdfs:seeAlso"))
