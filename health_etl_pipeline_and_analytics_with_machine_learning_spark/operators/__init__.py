# Importing populates the query registry. IMPORT ORDER IS LOAD-BEARING:
# the registry dict preserves insertion order, `__spark_entry__.queries()`
# emits it verbatim, and the driver's per-round correctness run checks a
# bounded prefix (first 50 in round 1). Modules are therefore ordered by
# verification priority, NOT alphabetically:
#
#   1. relational  — every SURVEY §2 core parity operator (r1: unchecked)
#   2. scaled      — 100 TB-path variants needing driver certification
#   3. prep/similarity/skew/multimodal — r1: past the window, unchecked
#   4. text/dedup/curation/advanced/events/joins — all driver-green in r1
#
# New round-N queries that need a fresh driver row belong in (or before)
# tier 2/3 modules so they land inside the checked prefix.
from . import relational  # noqa: F401  (tier 1: SURVEY §2 parity)
from . import scaled  # noqa: F401  (tier 2: driver-certified scale paths)
from . import prep, similarity, skew, multimodal  # noqa: F401  (tier 3)
from . import text, dedup, curation, advanced, events, joins  # noqa: F401  (tier 4: green in r1)
from . import warehouse  # noqa: F401  (tier 5: r5 maintenance family — hoisted into the window via _RECHECK_FIRST)
from . import tpch  # noqa: F401  (tier 5: classic TPC-H shapes — local oracle this round, window rotation next)
from . import mining  # noqa: F401  (tier 5: r5 sketch/interval/skyline family)

from .registry import REGISTRY as _R

#: ids that must occupy the driver's 50-entry correctness-window PREFIX,
#: in priority order. Front section = ids whose semantics changed (or
#: whose load path broke) this round and need a FRESH driver row; back
#: section = previously-certified window residents kept inside the
#: window so their green rows refresh instead of decaying to local-only.
#: r5 front: the four certification-lagged ops (two r4 oracle upgrades
#: whose newest driver rows still said no_oracle, two never checked),
#: the new oracle-certified BMP decode, the rewritten simhash pair
#: (narrow mapInPandas tally), the memoized-quantizer ANN pair, and the
#: four sessionization-family ops touched by the second-truncation
#: oracle pin + the distributed chunk writer.
_RECHECK_FIRST = [
    # — r6 fix tier: the four r5 driver hash-fails, re-certified after the
    #   HUGEINT-oracle + TZ-invariance fix (oracle output types now match
    #   Spark's numeric class column-for-column; epoch extraction goes
    #   through registry.epoch_us_utc). A green row here closes VERDICT
    #   r5 item 1 —
    "column_profile",
    "interval_concurrency_peak",
    "gaps_islands_streaks",
    "skew_diagnosis_gini",
    # — r6 re-certify tier: ops whose oracle text or epoch path changed
    #   in the same sweep (DECIMAL→DOUBLE lo_edge, BIGINT↔INT output
    #   alignment, epoch_us_utc call sites, fd NULL pinning) — all were
    #   driver-green before, want fresh rows on the new text —
    "histogram_fixed_width",
    "topk_per_group",
    "ntile_quartiles",
    "grouping_sets_agg",
    "supplier_revenue_rank",
    "entity_resolution_blocked",
    "seasonal_baseline_anomaly",
    "range_interval_window",
    "time_weighted_avg",
    "attribution_position_based",
    "fd_discovery",
    # — r6 backlog-drain tier: every registry entry that has NEVER had a
    #   driver row (VERDICT r5 item 2): the r5 statistics family, the
    #   streaming count-min replay, and all 14 TPC-H shapes. Registry
    #   growth is FROZEN this round so the backlog clears in one window —
    "streaming_countmin_replay",
    "theil_sen_slope",  # + ADVICE r5 even-m median fix
    "bootstrap_mean_ci",
    "encoding_run_stats",
    "abtest_proportions_ztest",
    "km_survival_estimate",
    "chi_square_independence",
    "shannon_entropy_profile",
    "rank_auc_mann_whitney",
    "spearman_rank_corr",
    "source_jsd_pairs",  # + ADVICE r5 rank-by-rounded fix
    "bigram_cross_entropy",
    "cume_dist_price_bands",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    # — r6 graduation: the former rows-only decode stub, rebuilt as a
    #   fully-oracled PPM(P6) byte-level roundtrip (VERDICT r5 item 4);
    #   new id, so it needs its first driver row now —
    "multimodal_ppm_decode",
    # — stale-refresh tier: last driver row dates to r1; refresh the
    #   oldest certifications with the remaining slots —
    "term_frequency_topk",
    "tfidf_top_terms",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "c4_heuristic_filter",
    "star_join_revenue",
    "bloom_filter_semi_join",
    # r5-green residents rotated out this round (unchanged, local
    # differential still covers them every test session):
    # similarity_lsh_bucketed, dedup_semantic_cluster, bpe_pair_counts,
    # source_vocab_overlap, multimodal_bmp_decode, text_simhash,
    # simhash_near_pairs, similarity_ivf_topk, sessionization,
    # streaming_sessionization, streaming_hour_rollup,
    # streaming_view_purchase_join, kmv_distinct_sketch,
    # weighted_sample_topk, cusum_changepoint, skyline_pareto,
    # assoc_rules_lift, brand_copurchase_triangles, pagerank_nation_trade,
    # token_pmi_topk, inverted_index_topk, mode_per_group,
    # kmv_join_cardinality, path_regex_match, benford_law_check,
    # mann_kendall_trend, rolling_correlation, multimodal_wav_decode,
    # zorder_interleave, countmin_estimate, cdc_latest_compaction,
    # merge_upsert_counts, scd2_dimension_update, snapshot_diff,
    # incremental_agg_update, heavy_hitters_twopass, ewma_smoothing,
    # largest_remainder_alloc, streaming_dedup_replay,
    # streaming_cdc_compaction.
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
