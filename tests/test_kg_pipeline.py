"""End-to-end KG pipeline semantics: the P/R gate vs the verbatim oracle,
determinism under parallelism, and the per-turn text-equality invariant
(BASELINE.json:input_hint)."""

from __future__ import annotations

from ontology_mapper_spark.datagen import build_snapshot, build_transcripts
from ontology_mapper_spark.datagen.snapshot import ontology_terms_rows
from ontology_mapper_spark.datagen.transcripts import transcripts_rows
from ontology_mapper_spark.oracle import semantics as ref
from ontology_mapper_spark.pipeline import (
    build_dictionary,
    detect_mentions,
    link_mentions,
)
from ontology_mapper_spark.pipeline.materialize import LOCAL_NS, extract_triples
from ontology_mapper_spark.pipeline.mention_detect import AhoCorasick

N_TERMS = 60
N_CONVS = 60
SEED = 42


def _python_golden_triples(term_rows, transcript_rows, patterns):
    """Pure-Python replica of detect→link→mapping-triples, built on the
    verbatim oracle (alignment_predicate mirrors utils/helpers.py:76-105):
    the golden set for the P/R >= 0.95 gate."""
    ac = AhoCorasick()
    for p in patterns:
        ac.add(p)
    ac.build()

    # pattern -> candidate term rows (label match or quality-filtered synonym)
    by_pattern: dict[str, list[dict]] = {}
    for t in term_rows:
        keys = {t["label"].lower().strip()}
        for s in t["synonyms"]:
            s_n = (s or "").lower().strip()
            if len(s_n) >= 3:
                keys.add(s_n)
        for k in keys:
            by_pattern.setdefault(k, []).append(t)

    golden: set[tuple[str, str, str]] = set()
    for conv_id, turn_idx, role, text, tool, ts in transcript_rows:
        for b, e, pat in ac.find(text):
            surface = text[b:e]
            key = surface.lower().strip().replace(" ", "_")
            cands = by_pattern.get(pat, [])
            # URI-priority dedup: bioportal first, then term_id, then via
            winners: dict[str, dict] = {}
            for c in sorted(
                cands,
                key=lambda c: (c["source"] != "bioportal", c["term_id"]),
            ):
                winners.setdefault(c["class_iri"], c)
            for iri, c in winners.items():
                pred = ref.alignment_predicate(c["label"], c["synonyms"], key)
                golden.add((f"{LOCAL_NS}{key}", pred, iri))
    return golden


def test_pr_gate_vs_verbatim_oracle(spark):
    terms, _ = build_snapshot(spark, n_terms=N_TERMS, seed=SEED)
    term_rows = ontology_terms_rows(N_TERMS, SEED)
    labels = sorted({r["label"] for r in term_rows})
    tr = build_transcripts(spark, n_convs=N_CONVS, seed=SEED, mention_labels=labels)
    pats = build_dictionary(terms)
    mentions = detect_mentions(spark, tr, pats)
    links = link_mentions(spark, mentions, terms, idf=None, top_k=10_000)
    triples = extract_triples(links)
    mapping = {
        (r.subj, r.pred, r.obj)
        for r in triples.collect()
        if r.pred.endswith("Match") or r.pred == "rdfs:seeAlso"
    }
    golden = _python_golden_triples(
        term_rows, transcripts_rows(N_CONVS, SEED, mention_labels=labels), pats
    )
    assert golden, "golden set must be non-empty for the gate to mean anything"
    tp = len(mapping & golden)
    precision = tp / max(len(mapping), 1)
    recall = tp / len(golden)
    assert precision >= 0.95, (precision, len(mapping - golden), sorted(mapping - golden)[:5])
    assert recall >= 0.95, (recall, len(golden - mapping), sorted(golden - mapping)[:5])
    # with no top-k truncation the match should in fact be exact
    assert precision == 1.0 and recall == 1.0


def test_transcripts_deterministic_across_partitioning(spark):
    a = build_transcripts(spark, n_convs=40, seed=7, partitions=2).collect()
    b = build_transcripts(spark, n_convs=40, seed=7, partitions=16).collect()
    ka = sorted((r.conv_id, r.turn_idx, r.text, r.role, str(r.ts)) for r in a)
    kb = sorted((r.conv_id, r.turn_idx, r.text, r.role, str(r.ts)) for r in b)
    assert ka == kb
    # and matches the pure-Python generator exactly
    py = sorted(
        (r[0], r[1], r[3], r[2]) for r in transcripts_rows(40, 7)
    )
    sp = sorted((r.conv_id, r.turn_idx, r.text, r.role) for r in a)
    assert py == sp


def test_per_turn_text_equality_invariant(spark):
    """input_hint: per-turn text equality under stable (conv_id, turn_idx)
    ordering — the pipeline must never reorder or mutate turn text."""
    from pyspark.sql import functions as F

    tr = build_transcripts(spark, n_convs=30, seed=11)
    # a representative pass through the engine's shuffle machinery
    roundtrip = (
        tr.repartition(13, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
    )
    orig = {(r.conv_id, r.turn_idx): r.text for r in tr.collect()}
    after = {(r.conv_id, r.turn_idx): r.text for r in roundtrip.collect()}
    assert orig == after
    # (conv_id, turn_idx) is a total order: no duplicates
    n = tr.count()
    assert tr.select("conv_id", "turn_idx").distinct().count() == n
    # turn_idx is dense 0..k-1 per conversation
    bad = (
        tr.groupBy("conv_id")
        .agg(F.max("turn_idx").alias("mx"), F.count("*").alias("n"))
        .where(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_link_determinism_two_runs(spark):
    terms, _ = build_snapshot(spark, n_terms=N_TERMS, seed=SEED)
    labels = sorted({r["label"] for r in ontology_terms_rows(N_TERMS, SEED)})
    tr = build_transcripts(spark, n_convs=25, seed=3, mention_labels=labels)
    pats = build_dictionary(terms)

    def run():
        m = detect_mentions(spark, tr, pats)
        lk = link_mentions(spark, m, terms, idf=None, top_k=3)
        return sorted(
            (r.conv_id, r.turn_idx, r.begin, r.end, r.class_iri, r.predicate, r.rank)
            for r in lk.collect()
        )

    assert run() == run()


def test_extract_concepts_and_priority(spark):
    from ontology_mapper_spark.pipeline.parse_ontology import (
        extract_concepts,
        priority_concepts,
    )

    ns = "http://example.org/ontology#"
    triples = spark.createDataFrame(
        [
            (f"{ns}Disease", "rdf:type", "rdfs:Class"),
            (f"{ns}Entity", "rdf:type", "rdfs:Class"),
            (f"{ns}long_covid", "rdf:type", f"{ns}Disease"),
            (f"{ns}other_thing", "rdf:type", f"{ns}Disease"),
            (f"{ns}orphan", "rdf:type", f"{ns}Missing"),
        ],
        ["subj", "pred", "obj"],
    )
    got = {(r.key, r.category, r.type) for r in extract_concepts(triples).collect()}
    assert got == {
        ("Disease", "class", "Disease"),
        ("long_covid", "instance", "Disease"),
        ("other_thing", "instance", "Disease"),
    }
    prio = {r.key for r in priority_concepts(extract_concepts(triples)).collect()}
    assert prio == {"Disease", "long_covid"}
