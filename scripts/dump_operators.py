"""Regenerate OPERATORS.md: the full registry inventory with module,
check tier, and one-line description — the line-by-line companion to
SURVEY.md §2's operator tables. Run:

    python scripts/dump_operators.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators  # noqa: F401,E402
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import (  # noqa: E402
    registry,
)

#: registry name → SURVEY §2 anchor (parity ops) or extension category
PROVENANCE = {
    "project_dropna": "§2.2 projection + multi-col dropna",
    "eq_filter_group_agg": "§2.2 interactive equality filter",
    "range_filter_agg": "§2.2 range predicate",
    "filter_group_avg_topk": "§2.4 Q1 deadliest diseases",
    "group2_sort_mixed_limit": "§2.4 Q2 recovery trends",
    "group_avg_having_sort": "§2.4 Q3 HAVING",
    "filter_group2_avg2_count_sort": "§2.4 Q4 treatment cost",
    "group_avg_sum2_topk": "§2.4 Q5 gender split (+§2.2 broken-WHERE fix)",
    "two_level_agg": "§2.4 Q6 avg-of-avgs",
    "trend_group_avg_sort": "§2.4 mortality trend",
    "group_sum2_unpivot": "§2.4+§2.7 gender melt (unpivot)",
    "overview_scalars": "§2.4 overview scalars + key-metric summary",
    "value_counts_topk": "§2.4 value_counts top-10",
    "dedup_exact": "§2.4 exact duplicate count",
    "median_fill": "§2.4 column medians (fill values)",
    "iqr_clip": "§2.4 IQR quantile clipping",
    "corr_matrix": "§2.4 Pearson correlation slice",
    "window_group_median_fill": "§2.4/§2.5 group-median transform fill",
    "global_sort_rowid": "§2.5 Record_ID global row-number",
    "events_hour_agg": "§2.9-adjacent batch twin of streaming rollup",
    "group_quantiles": "§2.4 quantile per group (exact)",
    "sessionization": "extension: event sessionization (batch twin)",
    "streaming_sessionization": "§2.9 stateful streaming sessionization (applyInPandasWithState), oracle-certified vs the batch twin",
    "streaming_hour_rollup": "§2.9 windowed streaming rollup replay, oracle-certified vs the batch hour agg",
    "streaming_view_purchase_join": "§2.9 stream-stream event-time range join, oracle-certified vs the batch range join",
    "json_props_extract": "extension: declared-schema JSON extraction",
    "set_intersect_except": "extension: INTERSECT/EXCEPT cohorts",
    "star_join_revenue": "extension: star join (broadcast dims)",
    "anti_join_inactive_customers": "extension: anti join",
    "rollup_status_priority": "extension: ROLLUP single-pass Expand",
    "cube_status_priority": "extension: CUBE + GROUPING markers",
    "window_lag_value_delta": "extension: LAG window deltas",
    "window_moving_avg": "extension: frame-based moving average",
    "ntile_quartiles": "extension: NTILE banding",
    "pivot_event_counts": "extension: single-shuffle count-if pivot",
    "topk_per_group": "extension: per-group top-k (WindowGroupLimit)",
    "asof_join_attribution": "extension: as-of join via union+window",
    "range_band_join": "extension: banded non-equi join",
    "regr_linear_fit": "extension: REGR_* closed-form OLS",
    "histogram_fixed_width": "extension: fixed-width histogram profiling",
    "events_gap_fill": "extension: time-series spine gap fill",
    "events_enrich_segment": "extension: dimension enrichment (stream-static twin)",
    "funnel_view_click_purchase": "extension: join-free ordered funnel",
    "approx_distinct_bound": "§4.3 exactness ladder (HLL vs exact)",
    "dedup_exact_text": "LLM-pipeline: exact text dedup",
    "dedup_incremental": "LLM-pipeline: incremental dedup vs historical corpus",
    "dedup_minhash_lsh": "LLM-pipeline: MinHash+LSH near-dedup",
    "dedup_ngram_jaccard": "LLM-pipeline: n-gram Jaccard near-dedup",
    "simhash_near_pairs": "LLM-pipeline: SimHash near-dedup",
    "dedup_common_spans": "LLM-pipeline: cross-document repeated spans",
    "dedup_semantic_cluster": "LLM-pipeline: SemDeDup-style cluster dedup",
    "embedding_neardup_topk": "LLM-pipeline: embedding-cosine near-dup",
    "similarity_bruteforce_topk": "LLM-pipeline: exact ANN baseline",
    "similarity_ivf_topk": "LLM-pipeline: IVF multi-probe ANN",
    "similarity_lsh_bucketed": "LLM-pipeline: LSH-bucketed ANN",
    "text_lang_id": "LLM-pipeline: n-gram language ID",
    "text_quality_score": "LLM-pipeline: quality scoring",
    "text_token_count": "LLM-pipeline: token counting",
    "text_simhash": "LLM-pipeline: document simhash",
    "doc_fingerprint": "LLM-pipeline: canonical fingerprint",
    "term_frequency_topk": "LLM-pipeline: corpus term frequency",
    "text_repetition_flags": "LLM-pipeline: Gopher-style repetition flags",
    "doc_chunk_explode": "LLM-pipeline: overlapping chunking",
    "pii_scrub_digits": "LLM-pipeline: identifier scrubbing",
    "hash_train_test_split": "LLM-pipeline: deterministic md5 split",
    "corpus_curation": "LLM-pipeline: composed curation pipeline",
    "multimodal_meta": "LLM-pipeline: multimodal metadata",
    "multimodal_decode_stub": "LLM-pipeline: multimodal decode (stubbed)",
    "multimodal_frame_sample": "LLM-pipeline: multimodal frame sampling",
    "ewma_smoothing": "extension: EWMA time-series smoothing (recurrence solved to closed form — no sequential state)",
    "largest_remainder_alloc": "extension: largest-remainder integer apportionment (exact-sum proration)",
    "entity_resolution_blocked": "LLM-pipeline: blocked fuzzy entity resolution (edit-distance match inside normalized-key blocks)",
    "streaming_dedup_replay": "§2.9 streaming exactly-once dedup (dropDuplicates state over an at-least-once replay), oracle-certified",
    "tpch_q1": "extension: TPC-H Q1 pricing summary (wide single-pass aggregate)",
    "tpch_q3": "extension: TPC-H Q3 shipping priority (selective join + top-k)",
    "tpch_q5": "extension: TPC-H Q5 local supplier volume (6-table star + cycle predicate)",
    "tpch_q6": "extension: TPC-H Q6 forecast revenue (pure pushed-predicate scan-agg)",
    "tpch_q10": "extension: TPC-H Q10 returned-item reporting (join + group + top-20)",
    "tpch_q14": "extension: TPC-H Q14 promotion effect (one-pass conditional share)",
    "tpch_q7": "extension: TPC-H Q7 volume shipping (disjunctive bilateral nation join)",
    "tpch_q13": "extension: TPC-H Q13 order-count distribution (predicate-in-ON left join histogram)",
    "tpch_q15": "extension: TPC-H Q15 top supplier (view + broadcast scalar-subquery max)",
    "tpch_q17": "extension: TPC-H Q17 small-quantity revenue (decorrelated per-part average)",
    "tpch_q18": "extension: TPC-H Q18 large-volume customers (IN-aggregate broadcast semi join)",
    "tpch_q19": "extension: TPC-H Q19 discounted revenue (OR-of-ANDs across both join sides)",
    "tpch_q8": "extension: TPC-H Q8 national market share (8-table tree, nation joined twice)",
    "tpch_q22": "extension: TPC-H Q22 sales opportunity (scalar-avg broadcast + anti join on recency)",
    "streaming_cdc_compaction": "§2.9 streaming CDC latest-row compaction (applyInPandasWithState O(1)/key), oracle-certified vs the batch twin",
    "bigram_cross_entropy": "LLM-pipeline: bigram-LM cross-entropy quality signal (narrow in-row bigram build)",
    "cume_dist_price_bands": "extension: CUME_DIST decile banding (ties-inclusive ranking window)",
    "kmv_distinct_sketch": "extension: KMV distinct sketch vs exact (mergeable cardinality estimation, md5-deterministic)",
    "weighted_sample_topk": "LLM-pipeline: deterministic weighted priority sampling (hash-uniform / weight, TakeOrdered)",
    "range_interval_window": "extension: time-range sliding window (RANGE INTERVAL frame on epoch seconds)",
    "cusum_changepoint": "extension: CUSUM change-point detection on the daily error series",
    "column_profile": "extension: single-pass column profiling (nulls/distinct/min/max, stack unpivot)",
    "interval_concurrency_peak": "extension: sweep-line interval concurrency peak (+1/-1 boundary prefix sums)",
    "skyline_pareto": "extension: 2-D Pareto skyline (staircase prune + broadcast verify; NOT EXISTS oracle)",
    "assoc_rules_lift": "extension: market-basket pair rules — support/confidence/lift, fraction-based apriori prune",
    "brand_copurchase_triangles": "extension: triangle census + clustering coefficient of the top-N co-purchase graph",
    "pagerank_nation_trade": "extension: fixed-iteration PageRank on the nation trade graph (unrolled-CTE oracle)",
    "token_pmi_topk": "LLM-pipeline: adjacent-token PMI collocations (shared bigram tokenizer, rounded-rank top-k)",
    "seasonal_baseline_anomaly": "extension: day-of-week x hour seasonal baseline + rounded-z anomaly flags",
    "inverted_index_topk": "extension: inverted-index build (token -> sorted postings, WindowGroupLimit truncation)",
    "mode_per_group": "extension: deterministic per-group MODE with share-of-group (count + rank, value-asc ties)",
    "gaps_islands_streaks": "extension: gaps-and-islands longest consecutive-day streak (rank-subtraction anchor)",
    "skew_diagnosis_gini": "extension: shuffle-key skew diagnosis — max/mean + exact-rank Gini over per-key counts",
    "kmv_join_cardinality": "extension: join-cardinality estimate from merged KMV sketches vs exact INTERSECT",
    "time_weighted_avg": "extension: step-function TWAP per type (LEAD-interval weights, capped, exact-microsecond)",
    "path_regex_match": "extension: MATCH_RECOGNIZE-style regex over per-user event symbol strings",
    "fd_discovery": "extension: pairwise functional-dependency mining in one multi-distinct pass (TANE core)",
    "benford_law_check": "extension: Benford first-digit conformance with per-digit chi-square terms (FLOOR-pinned binning)",
    "mann_kendall_trend": "extension: Mann-Kendall S + Kendall tau on the daily series (quadratic only post-agg)",
    "rolling_correlation": "extension: 7-day rolling Pearson CORR window between two daily series",
    "multimodal_wav_decode": "extension: REAL byte-level RIFF/WAVE PCM16 roundtrip, oracle recomputes rate/size/sample mean",
    "zorder_interleave": "extension: Z-order (Morton) interleave + per-range min/max envelopes (multi-dim layout math)",
    "attribution_position_based": "extension: U-shaped conversion attribution over ordered touch sequences (time-band join)",
    "countmin_estimate": "extension: Count-Min sketch point estimates vs exact (md5-seeded grid, overcount >= 0 certified)",
    "streaming_countmin_replay": "§2.9 streaming Count-Min grid over micro-batch replay, probed identically — same oracle as the batch twin",
    "theil_sen_slope": "extension: Theil-Sen robust trend slope (exact rank median of post-agg pairwise slopes)",
    "bootstrap_mean_ci": "extension: deterministic half-sample bootstrap CI (in-row replica membership, one pass)",
    "encoding_run_stats": "extension: RLE/delta encodability stats under primary order (layout-analysis shelf)",
    "abtest_proportions_ztest": "extension: two-proportion z-test over a deterministic hash A/B split (pooled variance, guarded)",
    "km_survival_estimate": "extension: Kaplan-Meier time-to-purchase survival with right-censoring (log-sum product form)",
    "chi_square_independence": "extension: chi-square independence of type x day-of-week (margin windows, no second scan)",
    "shannon_entropy_profile": "extension: Shannon entropy + normalized balance per categorical column",
    "rank_auc_mann_whitney": "extension: exact ROC-AUC via Mann-Whitney U with midrank ties — no pairwise pass",
    "spearman_rank_corr": "extension: Spearman rho via exact midranks (completes the correlation family)",
    "source_jsd_pairs": "LLM-pipeline: Jensen-Shannon divergence between source token distributions (shared-token join + closed-form unshared mass)",
    "cdc_latest_compaction": "extension: warehouse — CDC latest-row-wins compaction (struct-max, no window)",
    "merge_upsert_counts": "extension: warehouse — MERGE INTO semantics (full outer join + action classifier)",
    "scd2_dimension_update": "extension: warehouse — SCD type-2 dimension versioning",
    "snapshot_diff": "extension: warehouse — snapshot diff by key (added/removed/changed)",
    "incremental_agg_update": "extension: warehouse — incremental aggregate maintenance (base+delta == full recompute oracle)",
    "heavy_hitters_twopass": "extension: two-pass EXACT heavy hitters (Misra-Gries sketch + exact verify)",
    "multimodal_bmp_decode": "LLM-pipeline: REAL byte-level BMP decode (write\u2192parse roundtrip, independently recomputed oracle)",
    "salted_skew_agg": "extension: two-phase salted skew aggregation",
    "bloom_filter_semi_join": "extension: bitset bloom pre-filter + exact semi join",
    "grouping_sets_agg": "extension: GROUPING SETS single-pass Expand",
    "tfidf_top_terms": "LLM-pipeline: TF-IDF relevance weighting",
    "stratified_hash_sample": "LLM-pipeline: deterministic stratified sampling",
    "embedding_int8_quantize": "LLM-pipeline: int8 embedding quantization",
    "approx_quantile_bound": "§4.3 exactness ladder (GK quantile sketch vs exact)",
    "dedup_connected_components": "LLM-pipeline: transitive near-dup clustering (CC)",
    "contamination_ngram_check": "LLM-pipeline: benchmark decontamination (n-gram overlap)",
    "c4_heuristic_filter": "LLM-pipeline: C4-style heuristic filtering",
    "source_mixture_weights": "LLM-pipeline: domain-mixture reweighting",
    "mixture_resample": "LLM-pipeline: deterministic weighted resampling",
    "zscore_normalize": "extension: per-group z-score standardization",
    "running_distinct_users": "extension: cumulative distinct via first-seen identity",
    "cohort_retention": "extension: weekly cohort retention triangle",
    "user_event_paths": "extension: ordered event-path sequence mining",
    "percent_rank_band": "extension: PERCENT_RANK decile banding",
    "supplier_revenue_rank": "extension: per-nation dense_rank leaderboard (TPC-H Q15 shape)",
    "mad_outlier_detect": "extension: MAD robust outlier detection",
    "basket_concentration_hhi": "extension: basket HHI (single-pass share-of-group-sum)",
    "rfm_segments": "extension: RFM quartile customer segmentation",
    "brand_revenue_share": "extension: ratio-to-report revenue shares",
    "unigram_cross_entropy": "LLM-pipeline: unigram-LM cross-entropy quality signal",
    "forward_fill_last_purchase": "extension: LOCF forward fill (last ignorenulls)",
    "shard_assignment_balance": "LLM-pipeline: deterministic shard export balance",
    "set_ops_bag_semantics": "extension: INTERSECT ALL / EXCEPT ALL multiset ops",
    "sequence_pack_stats": "LLM-pipeline: concat-and-chunk sequence packing stats (parity tier, global-window cumsum)",
    "sequence_pack_scaled": "LLM-pipeline: sequence packing — 100 TB path (two-phase cumsum over static id buckets)",
    "vocab_oov_rate": "LLM-pipeline: top-V vocabulary coverage / per-source OOV rate (broadcast vocab join)",
    "bpe_pair_counts": "LLM-pipeline: BPE merge-candidate pair counts (type-space explode, frequency-weighted)",
    "source_vocab_overlap": "LLM-pipeline: cross-source vocabulary Jaccard (mixture-design diagnostic, token-blocked pair join)",
    "salted_skew_join": "extension: skew-safe big-big join (hot/cold split, deterministic salt, oracle = plain join)",
    "median_fill_scaled": "§2.4 column medians — 100 TB path (histogram distributed-exact, no per-value buffer)",
    "iqr_clip_scaled": "§2.4 IQR clipping — 100 TB path (histogram distributed-exact)",
    "group_quantiles_scaled": "§2.5 grouped quantiles — 100 TB path (histogram distributed-exact)",
}


def main() -> None:
    lines = [
        "# OPERATORS — registry inventory (generated by scripts/dump_operators.py)",
        "",
        "Every entry in `__spark_entry__.queries()`, with its implementing module,",
        "correctness tier (`oracle` = full DuckDB differential check of values +",
        "schema + row count; `rows-only` = driver smoke check, cross-validated by",
        "property tests in `tests/`), and provenance: the SURVEY.md §2 row it",
        "implements, or the extension category it belongs to.",
        "",
        "| # | query id | module | check | provenance |",
        "|---|---|---|---|---|",
    ]
    missing = []
    for i, (name, rq) in enumerate(sorted(registry.REGISTRY.items()), 1):
        mod = rq.fn.__module__.split(".")[-1]
        tier = "oracle" if rq.oracle else "rows-only"
        prov = PROVENANCE.get(name)
        if prov is None:
            missing.append(name)
            prov = "UNMAPPED"
        lines.append(f"| {i} | `{name}` | `operators/{mod}.py` | {tier} | {prov} |")
    if missing:
        raise SystemExit(f"unmapped registry entries: {missing}")
    n = len(registry.REGISTRY)
    n_oracle = sum(1 for rq in registry.REGISTRY.values() if rq.oracle)
    lines += [
        "",
        f"**{n} operators; {n_oracle} oracle-checked, {n - n_oracle} rows-only.**",
        "",
        "Beyond the registry, the engine also ships non-query surfaces:",
        "the full cleaning ETL (`pipeline.py`, golden-tested on the reference's",
        "own dirty CSV), health analytics q1-q6 with SQL twins (`queries.py`),",
        "the MLlib RandomForest model (`ml.py`), data-quality report",
        "(`quality.py`), report/export sinks (`report.py`, `sources/sinks.py`),",
        "bucketed/partitioned/range-sorted table layouts (`sources/`), and seven",
        "Structured Streaming flows (`streaming/`), three of them oracle-certified",
        "end-to-end (stateful sessionization, windowed rollup replay, and the",
        "stream-stream event-time range join).",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out} ({n} operators)")


if __name__ == "__main__":
    main()
