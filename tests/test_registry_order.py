"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries in round 1), and `__spark_entry__.queries()` emits
registry insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin:

- every SURVEY §2 core parity id inside the first-50 window,
- every id whose semantics changed this round (or that had no driver
  row in round 1) inside the window,
- the hoist mechanism in `operators/__init__.py` (_RECHECK_FIRST).
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: SURVEY §2 parity ids (relational.py) — unchecked by the driver in r1
#: because alphabetical module order registered them at positions 59-91.
#: 11 parity residents rotated out mid-r5 (project_dropna,
#: range_filter_agg, group2_sort_mixed_limit, group_avg_having_sort,
#: filter_group2_avg2_count_sort, group_avg_sum2_topk, two_level_agg,
#: trend_group_avg_sort, overview_scalars, dedup_exact, corr_matrix):
#: all r4-driver-green, unchanged since, still locally
#: differential-checked every session; their slots fund the new
#: mining/sketch/graph family's first driver certification.
#: (window_group_median_fill / global_sort_rowid / zscore_normalize /
#: median_fill / iqr_clip / group_quantiles likewise rotated out for the
#: batch-3/4 mining ops — the exact tier's _scaled twins stay in-window)
#: (eq_filter_group_agg / value_counts_topk rotated out for batch-5:
#: both r4-driver-green after their r3 fix, unchanged since)
#: (filter_group_avg_topk rotated out for countmin_estimate at the end
#: of r5 — r4-driver-green, plan-pinned, benched every round)
PARITY_IDS: list[str] = []

#: scale-path certifications + ids changed in round 2.
#: set_ops_bag_semantics and salted_skew_agg rotated out of the window
#: in r5 (r4-green, unchanged since) — their slots fund the r5
#: warehouse/streaming families.
#: (median_fill_scaled rotated out for multimodal_wav_decode — r4-green,
#: unchanged; iqr_clip_scaled + group_quantiles_scaled still represent
#: the distributed-quantile family in-window)
ROUND2_IDS = [
    "simhash_near_pairs",
]

#: tier-3 ids that were past the r1 window. The rest of the r2/r3 tier-3
#: residents (multimodal_meta, doc_chunk_explode, similarity_bruteforce_
#: topk, embedding_int8_quantize) were rotated out in r4: driver-green
#: in r3, still locally differential-tested; their window slots fund the
#: brand-new r4 certifications below.
#: (stratified_hash_sample rotated out mid-r5: r4-green, unchanged)
TIER3_SAMPLE: list[str] = []

#: ids that MUST newly certify in the r4 window
#: sequence_pack_stats rotated out in r5 (r4-green, unchanged; its
#: funnel-free twin sequence_pack_scaled stayed in-window until the
#: batch-6 rotation, which also retired sequence_pack_scaled,
#: vocab_oov_rate, and salted_skew_join — all r4-green, unchanged)
ROUND4_IDS = [
    "streaming_sessionization",
    "streaming_hour_rollup",
    "streaming_view_purchase_join",
    "similarity_ivf_topk",
]

#: ids that MUST newly certify in the r5 window: the four
#: certification-lagged ops, everything r5 touched, and the new
#: warehouse/heavy-hitter family
ROUND5_IDS = [
    "similarity_lsh_bucketed",
    "dedup_semantic_cluster",
    "bpe_pair_counts",
    "source_vocab_overlap",
    "multimodal_bmp_decode",
    "text_simhash",
    "sessionization",
    "cdc_latest_compaction",
    "merge_upsert_counts",
    "scd2_dimension_update",
    "snapshot_diff",
    "incremental_agg_update",
    "heavy_hitters_twopass",
    "ewma_smoothing",
    "largest_remainder_alloc",
    "entity_resolution_blocked",
    "streaming_dedup_replay",
    "streaming_cdc_compaction",
]

#: mid-r5 additions (operators/mining.py): sketch / sampling / interval /
#: profiling / basket / graph family — never driver-checked before
ROUND5B_IDS = [
    "kmv_distinct_sketch",
    "weighted_sample_topk",
    "range_interval_window",
    "cusum_changepoint",
    "column_profile",
    "interval_concurrency_peak",
    "skyline_pareto",
    "assoc_rules_lift",
    "brand_copurchase_triangles",
    "pagerank_nation_trade",
    "token_pmi_topk",
    "seasonal_baseline_anomaly",
    "inverted_index_topk",
    "mode_per_group",
    "gaps_islands_streaks",
    "skew_diagnosis_gini",
    "kmv_join_cardinality",
    "time_weighted_avg",
    "path_regex_match",
    "fd_discovery",
    "benford_law_check",
    "mann_kendall_trend",
    "rolling_correlation",
    "multimodal_wav_decode",
    "zorder_interleave",
    "attribution_position_based",
    "countmin_estimate",
]

#: locally certified, queued just past the full 50-slot window for the
#: r6 rotation (asserted to exist in the registry, not in the prefix)
ROUND5C_QUEUE = [
    "streaming_countmin_replay",
    "theil_sen_slope",
    "bootstrap_mean_ci",
    "encoding_run_stats",
    "abtest_proportions_ztest",
    "km_survival_estimate",
    "chi_square_independence",
    "shannon_entropy_profile",
    "rank_auc_mann_whitney",
    "spearman_rank_corr",
    "source_jsd_pairs",
]


def test_parity_and_round2_ids_inside_driver_window():
    prefix = list(REGISTRY)[:WINDOW]
    missing = [
        n
        for n in PARITY_IDS
        + ROUND2_IDS
        + TIER3_SAMPLE
        + ROUND4_IDS
        + ROUND5_IDS
        + ROUND5B_IDS
        if n not in prefix
    ]
    assert not missing, f"ids outside the driver's {WINDOW}-entry window: {missing}"


def test_queued_ops_are_registered_with_oracles():
    for n in ROUND5C_QUEUE:
        assert n in REGISTRY and REGISTRY[n].oracle, n


def test_recheck_ids_lead_the_registry():
    names = list(REGISTRY)
    for i, n in enumerate(ops._RECHECK_FIRST):
        assert names[i] == n, (n, names[:5])


def test_every_registered_query_has_fn_and_consistent_oracle_keys():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert list(q) == list(REGISTRY)
    assert set(o) <= set(q)
    for name, sql in o.items():
        assert sql and sql.strip(), name
