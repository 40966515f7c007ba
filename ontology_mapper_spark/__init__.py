"""ontology_mapper_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the query / data-processing
capabilities of JonasHeinickeBio/ontology-mapper (reference read-only at
/root/reference): offline ontology snapshots instead of per-term REST calls,
batched mention detection + entity-link scoring over transcript tables,
canonicalization via connected components, and materialized triple/node/edge
tables with per-partition lineage and metrics.

Layout:
    oracle/     pure-Python bit-exact reference semantics (golden oracle)
    functions/  Spark Column expressions mirroring the oracle (JVM-side)
    operators/  composable DataFrame operators (dedup, comparator, top-k, CC...)
    textops/    training-data pipeline ops (lang-id, quality, tokens, fingerprint)
    pipeline/   staged KG pipeline: mention-detect -> link-score -> canonicalize
                -> materialize, checkpoint-resumable
    sinks/      tabular/SSSOM/NT exports + metrics table
    datagen/    deterministic seeded synthetic inputs (transcripts, ontology
                snapshot, xrefs) for tests and benchmarks
"""

__version__ = "0.1.0"
