"""Deterministic offline ontology snapshot (the replacement for per-term
BioPortal/OLS REST calls — SURVEY.md S7/S8).

The reference queries two REST services per term at runtime
(/root/reference/services/bioportal.py:27-100, services/ols.py:26-84); at
10^12-turn scale that is impossible, so our engine consumes an *offline
snapshot*: an `ontology_terms` table (one row per term per service source)
and an `xrefs` edge table for canonicalization. This module generates a
deterministic, seeded synthetic snapshot with exactly the row shapes the
reference's candidate records have (services/bioportal.py:83-90,
services/ols.py:67-74) — including the junk the reference's cleaning code
must handle (dupe/case-variant/short synonyms for utils/helpers.py:39-73,
stock-prefixed >200-char definitions for utils/helpers.py:8-36) — plus
overlap/disjoint rows across the two sources to exercise the comparator
joins (services/comparator.py:27-54) and URI-priority dedup
(core/lookup.py:68-87).

Everything is a pure function of (seed, sizes): no wall clock, no global
randomness. Safe to regenerate anywhere and compare bit-exactly.
"""

from __future__ import annotations

import random

ONTOLOGIES = ("MONDO", "HP", "NCIT", "DOID", "GO", "CHEBI", "SYMP")

# Word pools for medical-ish labels. Includes the C1 classifier's indicator
# words (disease/disorder/condition/syndrome; symptom/sign/manifestation —
# utils/helpers.py:91-99) so alignment classes other than exact/related occur.
_HEAD_NOUNS = (
    "disease", "disorder", "condition", "syndrome", "symptom", "sign",
    "manifestation", "process", "entity", "response", "deficiency",
    "dysfunction", "infection", "inflammation", "lesion",
)
_MODIFIERS = (
    "chronic", "acute", "viral", "immune", "metabolic", "cardiac",
    "pulmonary", "renal", "hepatic", "neural", "genetic", "systemic",
    "persistent", "recurrent", "severe",
)
_TOPICS = (
    "fatigue", "covid", "fever", "pain", "anemia", "asthma", "diabetes",
    "migraine", "insomnia", "nausea", "vertigo", "tremor", "cough",
    "rash", "edema",
)

# The reference's priority concepts (core/parser.py:140-160) — planted
# verbatim so golden flows exercise the real strategy table.
PRIORITY_LABELS = ("long covid", "fatigue", "immune dysfunction")

_STOCK_PREFIXES = ("A ", "An ", "The ", "This is a ", "Definition: ", "")


def _term_label(rng: random.Random, i: int) -> str:
    # Plant the priority labels early so they exist in every snapshot size.
    if i < len(PRIORITY_LABELS):
        return PRIORITY_LABELS[i]
    return f"{rng.choice(_MODIFIERS)} {rng.choice(_TOPICS)} {rng.choice(_HEAD_NOUNS)}"


def _synonyms(rng: random.Random, label: str) -> list[str]:
    """Synonym lists with deliberate junk (exercises utils/helpers.py:39-73)."""
    syns = []
    n = rng.randrange(0, 5)
    for _ in range(n):
        kind = rng.randrange(6)
        if kind == 0:
            syns.append(label.upper())            # case variant of the label
        elif kind == 1:
            syns.append(f"{rng.choice(_MODIFIERS)} {rng.choice(_TOPICS)}")
        elif kind == 2:
            syns.append(rng.choice(_TOPICS))
        elif kind == 3:
            syns.append(rng.choice(("x", "ab", "", "  ")))   # short / blank junk
        elif kind == 4 and syns:
            syns.append(syns[-1])                  # exact duplicate
        else:
            syns.append(f"{rng.choice(_TOPICS)} {rng.choice(_HEAD_NOUNS)}")
    return syns


def _definition(rng: random.Random, label: str) -> str:
    base = (
        f"{label} characterized by {rng.choice(_MODIFIERS)} "
        f"{rng.choice(_TOPICS)} with {rng.choice(_MODIFIERS)} features"
    )
    if rng.randrange(5) == 0:  # long definition -> truncation path
        base = base + (" and additional clinical findings" * 8)
    return f"{rng.choice(_STOCK_PREFIXES)}{base}"


def ontology_terms_rows(
    n_terms: int = 200, seed: int = 42, hot_fraction: float = 0.3
) -> list[dict]:
    """One dict per (term, source) row.

    Columns: term_id, class_iri, ontology, label, synonyms, definition,
    source, is_hot. ~60% of terms appear in BOTH sources (same label,
    sometimes different URI → uri_match=False comparator rows), the rest in
    exactly one (bp_only / ols_only rows). `is_hot` marks the skew class:
    its label is a single very common topic word so mention detection and
    the candidate join see a hot key (FIXTURES.md §2 skew knob).
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    n_hot = max(1, int(1))  # exactly one designated hot term
    for i in range(n_terms):
        ontology = ONTOLOGIES[i % len(ONTOLOGIES)]
        local = f"{7000000 + i:07d}"
        term_id = f"{ontology}:{local}"
        class_iri = f"http://purl.obolibrary.org/obo/{ontology}_{local}"
        is_hot = i == 3  # a fixed, size-independent hot term
        label = "pain" if is_hot else _term_label(rng, i)
        syns = _synonyms(rng, label)
        definition = _definition(rng, label)
        both = rng.random() < 0.6
        srcs = ("bioportal", "ols") if both else (rng.choice(("bioportal", "ols")),)
        for src in srcs:
            uri = class_iri
            if src == "ols" and both and rng.random() < 0.2:
                uri = class_iri + "_OLSALT"  # same label, different URI
            rows.append(
                {
                    "term_id": term_id,
                    "class_iri": uri,
                    "ontology": ontology,
                    "label": label,
                    "synonyms": syns,
                    "definition": definition,
                    "source": src,
                    "is_hot": is_hot,
                }
            )
    _ = hot_fraction, n_hot
    return rows


def xrefs_rows(n_terms: int = 200, seed: int = 42) -> list[dict]:
    """Identity edges over class IRIs: chains, small cliques, plus a giant
    component through the hot class (skew test for connected components —
    FIXTURES.md §3)."""
    rng = random.Random(seed + 1)
    iri = lambda i: (  # noqa: E731
        f"http://purl.obolibrary.org/obo/{ONTOLOGIES[i % len(ONTOLOGIES)]}_{7000000 + i:07d}"
    )
    rows: list[dict] = []
    # chains of length 2-4 over consecutive ids
    i = 0
    while i < n_terms - 4:
        length = rng.randrange(2, 5)
        for j in range(length - 1):
            rows.append({"src_iri": iri(i + j), "dst_iri": iri(i + j + 1), "kind": "xref"})
        i += length + rng.randrange(1, 4)
    # giant component: every 10th term xrefs the hot class (index 3)
    for k in range(10, n_terms, 10):
        rows.append({"src_iri": iri(k), "dst_iri": iri(3), "kind": "xref"})
    # BP→OLS alias edges for the alt-URI rows
    rows.append({"src_iri": iri(3), "dst_iri": iri(3) + "_OLSALT", "kind": "bp_ols_alias"})
    return rows


def build_snapshot(spark, n_terms: int = 200, seed: int = 42):
    """(ontology_terms_df, xrefs_df) with explicit schemas, partitioned by
    ontology on write (partition pruning per SURVEY.md §4.1)."""
    from pyspark.sql import types as T

    terms_schema = T.StructType(
        [
            T.StructField("term_id", T.StringType(), False),
            T.StructField("class_iri", T.StringType(), False),
            T.StructField("ontology", T.StringType(), False),
            T.StructField("label", T.StringType(), False),
            T.StructField("synonyms", T.ArrayType(T.StringType()), False),
            T.StructField("definition", T.StringType(), True),
            T.StructField("source", T.StringType(), False),
            T.StructField("is_hot", T.BooleanType(), False),
        ]
    )
    xrefs_schema = T.StructType(
        [
            T.StructField("src_iri", T.StringType(), False),
            T.StructField("dst_iri", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
        ]
    )
    terms = spark.createDataFrame(ontology_terms_rows(n_terms, seed), terms_schema)
    xrefs = spark.createDataFrame(xrefs_rows(n_terms, seed), xrefs_schema)
    return terms, xrefs
