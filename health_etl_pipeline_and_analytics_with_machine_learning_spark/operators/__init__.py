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

from .registry import REGISTRY as _R

#: ids that must occupy the driver's 50-entry correctness-window PREFIX,
#: in priority order. Front section = ids whose semantics changed (or
#: whose load path broke) this round and need a FRESH driver row; back
#: section = previously-certified window residents kept inside the
#: window so their green rows refresh instead of decaying to local-only.
#: r4 front: the 20 events-table queries revived by the schema-adaptive
#: registry.load() fix (events.ts flipped nanos-long → timestamp[us] on
#: disk in r3), plus simhash_near_pairs (new hot-bucket cap).
_RECHECK_FIRST = [
    # — fresh-row tier (r4 changes) —
    "eq_filter_group_agg",
    "value_counts_topk",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "stratified_hash_sample",
    "salted_skew_agg",
    "asof_join_attribution",
    "cohort_retention",
    "events_enrich_segment",
    "events_gap_fill",
    "events_hour_agg",
    "forward_fill_last_purchase",
    "funnel_view_click_purchase",
    "json_props_extract",
    "mad_outlier_detect",
    "pivot_event_counts",
    "running_distinct_users",
    "sessionization",
    "user_event_paths",
    "window_lag_value_delta",
    "simhash_near_pairs",  # r4: hot-bucket cap on band buckets
    "streaming_sessionization",  # r4: new applyInPandasWithState op
    "streaming_hour_rollup",  # r4: new certified windowed-agg replay
    "streaming_view_purchase_join",  # r4: new certified stream-stream join
    "similarity_ivf_topk",  # r4: rows-only -> full oracle (det quantizer)
    "sequence_pack_stats",  # r4: new concat-and-chunk packing
    "sequence_pack_scaled",  # r4: its two-phase-cumsum 100 TB twin
    "vocab_oov_rate",  # r4: new top-V vocabulary coverage
    "salted_skew_join",  # r4: new hot/cold salted join
    # — keep-certified tier (SURVEY §2 parity + r2/r3 window residents) —
    "project_dropna",
    "range_filter_agg",
    "filter_group_avg_topk",
    "group2_sort_mixed_limit",
    "group_avg_having_sort",
    "filter_group2_avg2_count_sort",
    "group_avg_sum2_topk",
    "two_level_agg",
    "trend_group_avg_sort",
    "overview_scalars",
    "dedup_exact",
    "median_fill",
    "iqr_clip",
    "corr_matrix",
    "window_group_median_fill",
    "global_sort_rowid",
    "group_quantiles",
    "zscore_normalize",
    "median_fill_scaled",
    "iqr_clip_scaled",
    "group_quantiles_scaled",
    # multimodal_meta, similarity_bruteforce_topk, doc_chunk_explode,
    # embedding_int8_quantize: rotated out of the keep tier in r4 —
    # their r3 driver rows are green and the local DuckDB differential
    # (same check) still runs every test session; the four slots pay for
    # the brand-new r4 certifications (salted_skew_join, the three
    # streaming ops, sequence packing, vocab coverage) plus a fresh
    # driver row for similarity_ivf_topk, the flagship rows-only→oracle
    # flip of the deterministic-quantizer rework (its lsh/semantic
    # siblings share the mechanism and keep local certification).
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
