"""The driver's correctness gate verifies only the alphabetically FIRST
50 contract entries (VERDICT r2).  This pin freezes that window: any
rename/addition that displaces a driver-verified query (new names must
sort after q49) fails here before it silently drops an entry out of
the gate."""

from __future__ import annotations

DRIVER_WINDOW = [
    "kg_canonical_entities", "kg_links_transcripts",
    "kg_triples_transcripts",
    "q01_pruned_scan_agg", "q02_composite_filters", "q03_fragment_label",
    "q04_clean_description", "q05_cache_key", "q06_curie_expand",
    "q07_comparator_inner", "q08_left_anti", "q09_left_semi",
    "q10_broadcast_default", "q11_priority_dedup", "q12_synonym_dedup",
    "q13_groupby_count", "q14_sum_nested_sizes", "q15_tpch_q1",
    "q16_composite_sort", "q17_topk_per_group", "q18_array_slice",
    "q19_intersect", "q20_except", "q21_union_counts",
    "q22_stable_order_window", "q23_alignment_classifier",
    "q24_sessionize", "q25_exact_dedup", "q26_minhash_lsh_pairs",
    "q27_ngram_jaccard", "q28_simhash", "q29_cosine_topk",
    "q30_lsh_topk", "q31_text_stats", "q32_fingerprint",
    "q33_token_count", "q34_mention_detect", "q35_comention_edges",
    "q36_connected_components", "q37_variant_expand", "q38_sssom_rows",
    "q39_windowed_event_agg", "q40_media_features",
    "q41_bp_ols_name_map", "q44_full_row_distinct",
    "q45_comparison_counts", "q46_default_relationship",
    "q47_embedding_neardup", "q48_ivf_topk", "q49_asof_join",
]


def test_first_50_contract_names_are_stable():
    from ontology_mapper_spark.contract import QUERIES, ORACLES

    assert sorted(QUERIES)[:50] == DRIVER_WINDOW
    # every driver-window entry must keep its value-hash oracle
    for name in DRIVER_WINDOW:
        assert name in ORACLES, f"{name} lost its oracle"
