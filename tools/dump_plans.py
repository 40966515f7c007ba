#!/usr/bin/env python
"""Physical-plan evidence: writes BENCH/PLANS.md with `.explain("formatted")`
for the headline queries plus automated assertions of the properties the
plans must keep at 100 TB:

* parquet scans carry PushedFilters / a pruned ReadSchema where the query
  filters/projects (Catalyst pushdown reached the source);
* dimension joins are BroadcastHashJoin (no shuffle of the fact side);
* native chains stay inside WholeStageCodegen (no BatchEvalPython — the
  only Python is the documented Arrow `mapInPandas` mention detector);
* the per-turn KG path plans NO Exchange on the transcript side.

tests/test_plans.py enforces a subset of these per-query in CI; this tool
records the full text so a reviewer can read the actual plans per round.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_QUERIES = [
    "q01_pruned_scan_agg",
    "q15_tpch_q1",
    "q17_topk_per_group",
    "q26_minhash_lsh_pairs",
    "q29_cosine_topk",
    "q34_mention_detect",
    "q66_perplexity",
    "qa15_context_assembly",
    "qa16_interval_join",
    "qa20_oov_rate",
    "qa25_nb_classifier",
    "qa26_dsir_weights",
    "qa27_fuzzy_names",
    "qa33_pr_sweep",
    "qa37_lsh_pair_metrics",
    "qa41_cdc_upsert",
    "qa42_prefix_jaccard",
    "qa43_zorder_layout",
    "qa44_template_docs",
    "qa46_hard_negatives",
    "qa47_cusum_shifts",
    "qa48_mad_outliers",
    "qa49_community_quality",
    "qa50_int8_quant",
    "qa51_equidepth_bins",
    "qa52_incremental_lsh",
    "qa53_bpe_merges",
    "qa57_locf_gapfill",
    "qa58_funnel_steps",
    "qa60_spearman_rankcorr",
    "qa63_zonemap_pruning",
    "qa64_seasonality",
    "qa65_roc_auc",
    "qa67_kaplan_meier",
    "qa68_join_advisor",
    "qa69_benford",
    "qa70_acf",
    "qa71_neyman",
    "qa72_context_truncation",
    "qa73_silhouette",
    "qa74_shuffle_balance",
    "qa75_response_latency",
    "qa76_llr_edges",
    "qa77_mmr_rerank",
    "qa80_cluster_agreement",
    "qa81_decay_trend",
    "qa82_calibration",
    "qa83_profile_drift",
    "qa84_behavior_fingerprint",
    "qa85_novelty_curve",
    "qa86_multiclass_f1",
    "qa87_cuped",
    "qa88_bootstrap_ci",
    "qa89_ndcg",
    "qa90_bradley_terry",
    "qa91_ips_policy_eval",
    "qa92_log_bleu",
    "qa93_krippendorff_alpha",
    "qa94_pq_codebook",
    "qa95_sprt_monitor",
    "qa96_readability",
    "qa97_rbo",
    "qa98_kmv_set_ops",
    "qa99_randomization_test",
    "qb00_its_slope_change",
    "qb01_hill_tail_index",
    "qb02_heaps_law",
    "qb03_peak_concurrency",
    "qb04_decile_lift",
    "qb05_markov_stationary",
    "qb06_mixture_allocation",
    "qb07_ql_dirichlet",
    "qb08_jackknife_ratio",
    "qb09_pareto_sources",
    "qb10_diff_in_diff",
    "qb11_capture_recapture",
    "qb12_markov_entropy_rate",
    "qb13_two_proportion_ztest",
    "qb14_mcnemar",
    "qb15_cochran_armitage",
    "qb16_predicate_cardinality",
    "qb17_link_margins",
    "qb18_conformal_coverage",
    "qb19_mcc",
    "qb20_holm_fwer",
    "qb21_jsd_drift",
    "qb22_power_analysis",
    "qb23_bh_fdr",
    "qb24_shrunk_rates",
    "qb25_changepoint",
    "qb26_gumbel_extremes",
    "qb27_entity_turnover",
    "qb28_item_cooccurrence",
    "qb29_aba_motifs",
    "qb30_interarrival_burstiness",
    "qb31_stratified_ate",
    "qb32_lorenz_curve",
    "qb33_keyword_logodds",
    "qb34_marginal_coverage",
    "qb35_tokenizer_fertility",
    "qb36_dedup_composition",
    "qb37_del1_neardup",
    "qb38_padding_waste",
    "qb39_ohlc_bars",
    "qb40_last_touch",
    "qb41_pivot_counts",
    "qb42_linear_attribution",
    "qb43_rfm_segments",
    "qb44_referential_integrity",
    "qb45_profile_columns",
    "qb46_rolling_hll",
    "qb47_assoc_rules",
    "qb48_quantile_sketch",
    "qb49_assortativity",
    "qb50_greedy_cover",
    "qb51_char_entropy",
    "qb52_disorder_audit",
    "qb53_decayed_counts",
    "qb54_srm_check",
    "qb55_hour_dow_profile",
    "qb56_sequence_regex",
    "qb57_time_to_conversion",
    "qb58_feature_hash_audit",
    "qb59_rake_keywords",
    "qb60_embedding_drift",
    "qb61_mutual_best",
    "qb62_ltv_curve",
    "qb63_anomalous_days",
    "qb64_bloom_fpr",
    "qb65_pii_audit",
    "qb66_grouping_sets",
]

#: waves qa57+ — generic 100 TB-shape assertions: never a cartesian or
#: non-broadcast nested-loop product, never row-at-a-time Python.  (The
#: single-row broadcast cross joins these queries DO use plan as
#: BroadcastNestedLoopJoin over one row — allowed.)
GENERIC_CHECK = {
    "qa57_locf_gapfill",
    "qa58_funnel_steps",
    "qa60_spearman_rankcorr",
    "qa63_zonemap_pruning",
    "qa64_seasonality",
    "qa65_roc_auc",
    "qa67_kaplan_meier",
    "qa68_join_advisor",
    "qa69_benford",
    "qa70_acf",
    "qa71_neyman",
    "qa72_context_truncation",
    "qa73_silhouette",
    "qa74_shuffle_balance",
    "qa75_response_latency",
    "qa76_llr_edges",
    "qa77_mmr_rerank",
    "qa80_cluster_agreement",
    "qa81_decay_trend",
    "qa82_calibration",
    "qa83_profile_drift",
    "qa84_behavior_fingerprint",
    "qa85_novelty_curve",
    "qa86_multiclass_f1",
    "qa87_cuped",
    "qa88_bootstrap_ci",
    "qa89_ndcg",
    "qa90_bradley_terry",
    "qa91_ips_policy_eval",
    "qa92_log_bleu",
    "qa93_krippendorff_alpha",
    "qa94_pq_codebook",
    "qa95_sprt_monitor",
    "qa96_readability",
    "qa97_rbo",
    "qa98_kmv_set_ops",
    "qa99_randomization_test",
    "qb00_its_slope_change",
    "qb01_hill_tail_index",
    "qb02_heaps_law",
    "qb03_peak_concurrency",
    "qb04_decile_lift",
    "qb05_markov_stationary",
    "qb06_mixture_allocation",
    "qb07_ql_dirichlet",
    "qb08_jackknife_ratio",
    "qb09_pareto_sources",
    "qb10_diff_in_diff",
    "qb11_capture_recapture",
    "qb12_markov_entropy_rate",
    "qb13_two_proportion_ztest",
    "qb14_mcnemar",
    "qb15_cochran_armitage",
    "qb16_predicate_cardinality",
    "qb17_link_margins",
    "qb18_conformal_coverage",
    "qb19_mcc",
    "qb20_holm_fwer",
    "qb21_jsd_drift",
    "qb22_power_analysis",
    "qb23_bh_fdr",
    "qb24_shrunk_rates",
    "qb25_changepoint",
    "qb26_gumbel_extremes",
    "qb27_entity_turnover",
    "qb28_item_cooccurrence",
    "qb29_aba_motifs",
    "qb30_interarrival_burstiness",
    "qb31_stratified_ate",
    "qb32_lorenz_curve",
    "qb33_keyword_logodds",
    "qb34_marginal_coverage",
    "qb35_tokenizer_fertility",
    "qb36_dedup_composition",
    "qb37_del1_neardup",
    "qb38_padding_waste",
    "qb39_ohlc_bars",
    "qb40_last_touch",
    "qb41_pivot_counts",
    "qb42_linear_attribution",
    "qb43_rfm_segments",
    "qb44_referential_integrity",
    "qb45_profile_columns",
    "qb46_rolling_hll",
    "qb47_assoc_rules",
    "qb48_quantile_sketch",
    "qb49_assortativity",
    "qb50_greedy_cover",
    "qb51_char_entropy",
    "qb52_disorder_audit",
    "qb53_decayed_counts",
    "qb54_srm_check",
    "qb55_hour_dow_profile",
    "qb56_sequence_regex",
    "qb57_time_to_conversion",
    "qb58_feature_hash_audit",
    "qb59_rake_keywords",
    "qb60_embedding_drift",
    "qb61_mutual_best",
    "qb62_ltv_curve",
    "qb63_anomalous_days",
    "qb64_bloom_fpr",
    "qb65_pii_audit",
    "qb66_grouping_sets",
}


#: Queries ALLOWED to plan an unpartitioned Window, each with the reason
#: its input is bounded (never row-level / corpus-sized).  Everything
#: else that plans one is a VIOLATION — the qb04 global-ntile class
#: (single-task sort of the corpus at scale) can't regress silently.
#: Filled from the discovery run; keep justifications honest.
WINDOW_ALLOWLIST: dict[str, str] = {
    "q48_ivf_topk": "IVF centroid seed table (n_centroids rows) + rank over the final top-k survivors",
    "q76_seq_packing": "64-row shard-offset table (the TWO-PHASE global prefix sum's small side)",
    "q77_bpe_pairs": "rank over the <=k merged-pair table after TakeOrderedAndProject",
    "q82_bm25_topk": "rank over <=top_k survivors of TakeOrderedAndProject",
    "q85_weighted_sample": "rank over <=k TakeOrdered sample survivors",
    "q86_rrf_hybrid": "per-ranker and fused ranks all over <=top_k TakeOrdered lists",
    "qa19_negative_samples": "256-row md5-prefix bucket histogram (two-phase vocab rank offsets)",
    "qa22_mann_whitney": "distinct-value score histogram (doubled-midrank idiom)",
    "qa24_curriculum": "per-source size table (closed-form interleave rank, sources are a dimension)",
    "qa30_zipf_slope": "count-of-counts histogram (rank-run explode; ~O(sqrt(corpus)) rows)",
    "qa33_pr_sweep": "fixed threshold-grid sweep table",
    "qa46_hard_negatives": "16-row centroid probe table + per-query shortlist rank",
    "qa58_funnel_steps": "funnel step spine (fixed number of steps)",
    "qa63_zonemap_pruning": "per-file zone-map table (file-count rows, not row-level)",
    "qa67_kaplan_meier": "distinct event-day risk table (day-resolution survival spine)",
    "qa71_neyman": "stratum summary table (strata are a dimension)",
    "qa74_shuffle_balance": "shuffle-partition stats table (numPartitions rows)",
    "qa82_calibration": "fixed-count calibration bin table",
    "qa85_novelty_curve": "day spine (cumulative vocabulary per day)",
    "qa86_multiclass_f1": "class contingency table (classes are a dimension)",
    "qa89_ndcg": "per-group summary wall mean (evaluation query set, dictionary-sized)",
    "qa90_bradley_terry": "item strength table (items are a dictionary-sized dimension)",
    "qa94_pq_codebook": "codebook table (k centroids x dims rows)",
    "qa95_sprt_monitor": "day-spine cumulative LLR (sequential test over days)",
    "qb02_heaps_law": "30-day synthetic calendar accumulation table",
    "qb04_decile_lift": "score histogram tile boundaries + 10-row tile cumulative table",
    "qb05_markov_stationary": "state-transition matrix (n_states^2 rows)",
    "qb06_mixture_allocation": "source mixture table (sources are a dimension)",
    "qb07_ql_dirichlet": "rank over <=top_k survivors of TakeOrderedAndProject",
    "qb08_jackknife_ratio": "leave-one-out group summary table",
    "qb12_markov_entropy_rate": "state-transition matrix (n_states^2 rows)",
    "qb17_link_margins": "rank_dictionary decision table (dictionary-sized)",
    "qb18_conformal_coverage": "score histogram cumulative counts (conformal quantile)",
    "qb20_holm_fwer": "hypothesis-family table (m groups, m <= max_m guarded)",
    "qb23_bh_fdr": "hypothesis-family table (m groups, m <= max_m guarded)",
    "qb24_shrunk_rates": "per-source rate table (sources are a dimension)",
    "qb25_changepoint": "day-spine prefix sums (calendar-bounded)",
    "qb32_lorenz_curve": "per-unit weight histogram tiles + 10-row tile cumulative table",
    "qb34_marginal_coverage": "source-spine cumulative rollup (sources are a dimension)",
    "qb43_rfm_segments": "metric-histogram BUCKET-offset tables (3 two-phase ranks; bucket count = value-range/2^16, never row-level)",
    "qb63_anomalous_days": "trailing window over the day spine (calendar-bounded rows)",
    "qb69_psi_drift": "wall sums over the n_bins-row bin spine (fixed bin count)",
    "qb71_t_closeness": "global cumulative over the m-row sensitive-bucket spine (fixed bucket count)",
    "qb79_quantile_normalization": "distinct-value histogram cumulative (qa22/qa30 family, never row-level)",
    "qb80_lead_lag": "is_best rank over the 15-row lag spine",
    "qb85_nelson_aalen": "distinct-duration risk table (qa67 family; coarsen durations at scale)",
    "qb91_logrank": "distinct-duration risk table (qa67 family; coarsen durations at scale)",
    "qb96_wasserstein": "distinct-value histogram cumulative + gap (qa22/qa30 family)",
    "qc01_err_cascade": "per-group summary wall mean (qa89 family; evaluation query set, dictionary-sized)",
    "qc02_mrr": "per-group summary wall mean (qa89 family; evaluation query set, dictionary-sized)",
    "qc04_kruskal_wallis": "distinct-value score histogram (qa22 doubled-midrank idiom)",
    "qc06_cliffs_delta": "distinct-value score histogram (qa22 doubled-midrank idiom)",
    "qc08_qini_curve": "distinct-score uplift spine cumulative + trapezoid lag (qa22 family)",
    "qc12_rmst": "distinct-duration KM curve + area lag (qa67 family; coarsen durations at scale)",
    "qc21_delong_auc": "distinct-score placement spines (qa22 family; one per compared model)",
    "qc31_hellinger_tv": "distinct-value two-side histogram (qb96 family)",
    "qc32_dunn_posthoc": "distinct-value score histogram (qa22 doubled-midrank idiom)",
    "qc37_cramer_von_mises": "distinct-value two-side histogram cumulative (qb96 family)",
    "qc46_anderson_darling": "distinct-value two-side histogram cumulative (qb96 family)",
    "qc47_seasonal_indices": "day-spine moving-average windows (calendar-bounded)",
    "qc50_durbin_watson": "day-spine residual lag windows (calendar-bounded)",
    "qc54_greenwood_ci": "distinct-duration KM curve (qa67 family; coarsen durations at scale)",
    "qc57_weibull_fit": "distinct-duration median-rank grid (qa67 family; coarsen durations at scale)",
    "qc59_kupiec_pof": "train-slice value histogram cumulative (qa22 family)",
    "qc63_woe_iv": "value histogram p90 cut (qa22 family)",
    "qc64_regression_discontinuity": "per-user activity histogram median cut (qa22 family; distinct activity levels, never row-level)",
    "qc73_aalen_johansen": "distinct-duration risk spine (qa67 family; coarsen durations at scale)",
    "qc76_woolf_homogeneity": "value histogram p75 cut (qa22 family)",
    "qc78_isotonic_calibration": "occupied-bin spine prefix sums + row_number (fixed n_bins, never row-level)",
    "qc79_gpd_tail": "value histogram percentile cuts (qa22 family)",
    "qc85_newey_west": "dense day-spine lag windows (calendar-bounded)",
    "qc87_pass_at_k": "value histogram median cut (qa22 family)",
    "qc92_slo_burn_rate": "dense hour-spine trailing windows (calendar-bounded) + p10 histogram cut",
    "qd00_energy_distance": "combined distinct-value histogram cumulative + gap (qb96 family)",
    "qd05_user_slopes": "distinct-slope histogram quartile cuts (qa22 family)",
    "qd09_groupkey_skew": "group-size histograms per candidate key (O(sqrt(rows)) distinct sizes, qa30 family)",
    "qd14_conformal_curve": "score histogram cumulative counts (qb18 family; alpha grid is a broadcast dimension)",
    "qd15_nested_quantiles": "day-level p95 histogram median (calendar-bounded second level)",
    "qc66_pca_power": "power-iteration norm over the d-row w frame (embedding-dimension table, one window per round)",
    "qd20_pacf": "dense day-spine lag windows (calendar-bounded, qc85 family)",
    "qd22_activation_lag": "value histogram p90 cut + hour-lag histogram quartiles (qa22 family)",
    "qd24_ranking_stability": "source-dimension rankings (sources are a dictionary-sized dimension)",
    "qd25_early_signal_lift": "first-week activity histogram quartile cuts (qa22 family)",
    "qd26_abc_analysis": "revenue bucket spine cumulative (range/2^16 buckets, qb43 family)",
    "qd27_fisher_bh": "p-value rank over the event-type dimension (qc61 family; m tests = dictionary-sized) + qc61's sample windows",
    "qd28_tail_contribution": "value histogram p99 cut (qa22 family)",
    "qd31_funnel_ztest": "funnel step spine (fixed number of steps, qa58 family, once per segment)",
    "qd33_split_gain": "feature value histogram cumulative (qa22 family; distinct n_chars values)",
    "qd41_fisher_by": "p-value rank over the event-type dimension (qd27/qc61 family) + qc61's sample windows",
    "qd45_seasonal_anomaly": "residual + MAD medians over the 30-row day spine (calendar-bounded, qa48/qc41 family)",
}


def n_unpartitioned_windows(plan: str) -> int:
    """Count window expressions whose windowspecdefinition has an EMPTY
    partition spec.  Formatted mode omits empty trailing argument groups
    on the Window node (a wall window prints `Arguments: [sum(x)
    windowspecdefinition(specifiedwindowframe(...)) AS ...]` with no
    partition/order groups at all), so the reliable signal is the
    windowspecdefinition argument list itself:
    windowspecdefinition(partCols..., orderCols..., frame) — if the
    FIRST depth-0 argument is the frame, or carries an ASC/DESC NULLS
    order marker, there are no partition columns."""
    import re as _re

    n = 0
    start = 0
    needle = "windowspecdefinition("
    while True:
        i = plan.find(needle, start)
        if i < 0:
            break
        j = i + len(needle)
        depth = 1
        first_arg_end = None
        k = j
        while k < len(plan) and depth > 0:
            ch = plan[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1 and first_arg_end is None:
                first_arg_end = k
            k += 1
        first = plan[j : first_arg_end if first_arg_end is not None else k - 1]
        first = first.strip()
        if first.startswith("specifiedwindowframe(") or _re.search(
            r"(ASC|DESC) NULLS (FIRST|LAST)$", first
        ):
            n += 1
        start = k
    return n


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")
    from ontology_mapper_spark.contract import QUERIES
    from ontology_mapper_spark.session import get_spark

    spark = get_spark(
        app_name="plans", master="local[4]", shuffle_partitions=4,
        driver_memory="4g",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "BENCH", "PLANS.md")
    checks: list[str] = []
    with open(out, "w") as fh:
        fh.write(
            "# Physical plans of the headline queries (sf0.001, AQE on)\n\n"
            "Generated by tools/dump_plans.py — the properties asserted at\n"
            "the bottom are the ones that must hold for the 100 TB plan\n"
            "shape: pushdown reaching the parquet scan, broadcast dimension\n"
            "joins, whole-stage codegen on native chains, and no exchange on\n"
            "the per-turn KG path.\n"
        )
        for name in PLAN_QUERIES:
            df = QUERIES[name](spark, sf_dir)
            plan = formatted_plan(df)
            fh.write(f"\n## {name}\n\n```\n{plan}\n```\n")
            if name == "q01_pruned_scan_agg":
                # formatted AQE plans don't print WholeStageCodegen spans;
                # assert the two scan-level properties they DO print:
                # pushed predicates and a pruned ReadSchema (3 of
                # lineitem's 16 columns)
                ok = (
                    "PushedFilters: [IsNotNull" in plan
                    and "ReadSchema: struct<l_quantity" in plan
                )
                checks.append(f"{name}: pushdown+pruning {'OK' if ok else 'MISSING'}")
            if name == "q29_cosine_topk":
                ok = "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
                checks.append(f"{name}: broadcast query side {'OK' if ok else 'MISSING'}")
            if name == "q26_minhash_lsh_pairs":
                ok = "CartesianProduct" not in plan
                checks.append(f"{name}: no cartesian product {'OK' if ok else 'VIOLATED'}")
            if name == "q34_mention_detect":
                ok = "BatchEvalPython" not in plan  # Arrow mapInPandas only
                checks.append(f"{name}: no row-at-a-time Python {'OK' if ok else 'VIOLATED'}")
            if name == "qa15_context_assembly":
                # running sum + group agg must share ONE conv exchange
                # (formatted mode prints each exchange as a "(N) Exchange"
                # detail header; BroadcastExchange would be a different word)
                import re as _re

                n_ex = len(_re.findall(r"^\(\d+\) Exchange$", plan, _re.M))
                checks.append(
                    f"{name}: single conv exchange "
                    f"{'OK' if n_ex == 1 else 'VIOLATED (%d)' % n_ex}"
                )
            if name == "qa16_interval_join":
                ok = (
                    "BroadcastNestedLoopJoin" not in plan
                    and "CartesianProduct" not in plan
                )
                checks.append(f"{name}: range join bucketized to equi-join "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa20_oov_rate":
                ok = "TakeOrderedAndProject" in plan
                checks.append(f"{name}: vocab via distributed top-k "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name in GENERIC_CHECK:
                ok = (
                    "CartesianProduct" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: no cartesian, no per-row Python "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa25_nb_classifier":
                # scoring pass: model grid broadcast into the token join,
                # no Python anywhere in the NB path
                ok = "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
                checks.append(f"{name}: broadcast model grid, no Python "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa26_dsir_weights":
                ok = "TakeOrderedAndProject" in plan
                checks.append(f"{name}: selection via distributed top-k "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa27_fuzzy_names":
                # block key must plan as an equi-join (the < predicate is a
                # post-join filter), never a cartesian/nested-loop product
                ok = (
                    "CartesianProduct" not in plan
                    and "BroadcastNestedLoopJoin" not in plan
                )
                checks.append(f"{name}: blocked equi-join, no all-pairs "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa41_cdc_upsert":
                # MERGE via one window — the plan must contain NO join at
                # all (union + row_number, one hash exchange on the key)
                ok = "Join" not in plan
                checks.append(f"{name}: join-free window merge "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa42_prefix_jaccard":
                # prefix filter keeps every join an equi-join on token /
                # pair keys — never a similarity cross product
                ok = (
                    "CartesianProduct" not in plan
                    and "BroadcastNestedLoopJoin" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: prefix-filtered equi-joins only "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa43_zorder_layout":
                # global extent joins in as a broadcast single row; the
                # interleave is pure integer Columns (no Python)
                ok = (
                    "CartesianProduct" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: broadcast extent, native bit math "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa44_template_docs":
                # head+tail frames in ONE scan (explode), grouped without
                # any join or Python
                ok = "Join" not in plan and "BatchEvalPython" not in plan
                checks.append(f"{name}: single-scan frame groups "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name in ("qa33_pr_sweep", "qa37_lsh_pair_metrics"):
                # evaluation compositions must stay equi-join keyed (the
                # TP/overlap marking is never a cross product) and free of
                # row-at-a-time Python
                ok = (
                    "CartesianProduct" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: keyed eval joins, no Python "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa46_hard_negatives":
                # IVF shortlist: the only non-equi join is the 16-row
                # broadcast centroid probe; never an all-pairs corpus
                # product or Python
                ok = (
                    "CartesianProduct" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: IVF shortlist, no all-pairs "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa47_cusum_shifts":
                # counts agg + entity windows: two exchanges max
                # ((type,day) count, then type window), zero Python
                import re as _re

                n_ex = len(_re.findall(r"^\(\d+\) Exchange$", plan, _re.M))
                ok = n_ex <= 2 and "BatchEvalPython" not in plan
                checks.append(f"{name}: <=2 exchanges, no Python "
                              f"{'OK' if ok else 'VIOLATED (%d)' % n_ex}")
            if name == "qa48_mad_outliers":
                # per-group median/MAD dims join back as broadcasts
                ok = "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
                checks.append(f"{name}: broadcast med/MAD dims "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa49_community_quality":
                # scalar m rides as a broadcast 1-row join; label lookups
                # are keyed equi-joins; no Python
                ok = (
                    "CartesianProduct" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: broadcast scalar m, keyed joins "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa50_int8_quant":
                # 64-row per-dim codebook joins back as a broadcast
                ok = "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
                checks.append(f"{name}: broadcast codebook "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa51_equidepth_bins":
                # ntile window and the (g,bin) agg must share ONE exchange
                # (partitioning on g satisfies the (g,bin) clustering)
                import re as _re

                n_ex = len(_re.findall(r"^\(\d+\) Exchange$", plan, _re.M))
                checks.append(
                    f"{name}: single group exchange "
                    f"{'OK' if n_ex == 1 else 'VIOLATED (%d)' % n_ex}"
                )
            if name == "qa52_incremental_lsh":
                # delta-vs-index candidate gen is equi-join only
                ok = (
                    "CartesianProduct" not in plan
                    and "BroadcastNestedLoopJoin" not in plan
                    and "BatchEvalPython" not in plan
                )
                checks.append(f"{name}: band equi-joins only "
                              f"{'OK' if ok else 'VIOLATED'}")
            if name == "qa53_bpe_merges":
                # merge rules broadcast into the vocab replace; no Python
                ok = "BatchEvalPython" not in plan
                checks.append(f"{name}: native vocab merges "
                              f"{'OK' if ok else 'VIOLATED'}")
        # global sweep: EVERY contract query must either plan zero
        # unpartitioned Windows or carry a bounded-input justification
        fh.write("\n## Unpartitioned-Window sweep (all contract queries)\n\n")
        win_viol: list[str] = []
        win_allowed: list[str] = []
        for name in sorted(QUERIES):
            try:
                plan = formatted_plan(QUERIES[name](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — report, don't die
                win_viol.append(f"{name}: PLAN ERROR {exc}")
                continue
            n_w = n_unpartitioned_windows(plan)
            if n_w == 0:
                continue
            if name in WINDOW_ALLOWLIST:
                win_allowed.append(
                    f"{name}: {n_w} unpartitioned window(s) — "
                    f"{WINDOW_ALLOWLIST[name]}"
                )
            else:
                win_viol.append(
                    f"{name}: {n_w} unpartitioned window(s) NOT allowlisted"
                )
        stale = sorted(
            set(WINDOW_ALLOWLIST)
            - {e.split(":", 1)[0] for e in win_allowed}
        )
        for e in win_allowed:
            fh.write(f"* allowed — {e}\n")
        for e in win_viol:
            fh.write(f"* VIOLATED — {e}\n")
        for e in stale:
            fh.write(f"* stale allowlist entry (no window planned) — {e}\n")
        ok = not win_viol
        checks.append(
            "window sweep: "
            + (
                f"OK ({len(win_allowed)} allowlisted bounded windows)"
                if ok
                else "VIOLATED: " + "; ".join(win_viol)
            )
        )
        fh.write("\n## Automated property checks\n\n")
        for c in checks:
            fh.write(f"* {c}\n")
    print("\n".join(checks))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
