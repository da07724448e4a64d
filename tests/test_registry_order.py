"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-8
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — the full r4 cohort plus the oldest r5-cohort remainder.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: changed-text tier — fresh driver rows REQUIRED: median_fill/iqr_clip
#: consume the r8 quantile-engine fix (0-based rank extraction +
#: symmetric interpolation; VERDICT r7 item 1) and median_fill's final
#: rounding moved from Python round() into a Spark F.round expression;
#: dedup_minhash_lsh gained the lazy `bands` localCheckpoint;
#: five NEW r8 ops hold changed-text slots: quantile_profile (the
#: engine certified directly at 4 cols × 6 probs), split_leakage_check
#: (cross-split near-dup audit), source_quantile_normalize
#: (cross-source calibration onto the global quantile scale),
#: truncation_loss_curve (context-length audit), and
#: doc_self_repetition (intra-doc shingle repetition) — funded by five
#: r5-cohort residents ceding their refresh slots
ROUND8_CHANGED_IDS = [
    "median_fill",
    "iqr_clip",
    "dedup_minhash_lsh",
    "quantile_profile",
    "split_leakage_check",
    "source_quantile_normalize",
    "truncation_loss_curve",
    "doc_self_repetition",
]

#: oldest-first refresh: every live op whose latest driver row dates to
#: round 4 (staleness 4 entering r8 — the oldest cohort remaining)
ROUND8_R4_COHORT_IDS = [
    "asof_join_attribution",
    "cohort_retention",
    "corr_matrix",
    "dedup_exact",
    "eq_filter_group_agg",
    "events_enrich_segment",
    "events_gap_fill",
    "events_hour_agg",
    "filter_group2_avg2_count_sort",
    "forward_fill_last_purchase",
    "funnel_view_click_purchase",
    "global_sort_rowid",
    "group2_sort_mixed_limit",
    "group_avg_having_sort",
    "group_avg_sum2_topk",
    "group_quantiles",
    "group_quantiles_scaled",
    "iqr_clip_scaled",
    "json_props_extract",
    "mad_outlier_detect",
    "median_fill_scaled",
    "overview_scalars",
    "pivot_event_counts",
    "project_dropna",
    "range_filter_agg",
    "running_distinct_users",
    "salted_skew_agg",
    "salted_skew_join",
    "sequence_pack_scaled",
    "sequence_pack_stats",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "stratified_hash_sample",
    "trend_group_avg_sort",
    "two_level_agg",
    "user_event_paths",
    "value_counts_topk",
    "vocab_oov_rate",
    "window_group_median_fill",
    "window_lag_value_delta",
    "zscore_normalize",
]

#: the leftover slots go to the oldest r5-cohort ops (alphabetical
#: within the equal-staleness tie; similarity_lsh_bucketed leads as the
#: round's shared-subtree audit target)
ROUND8_R5_COHORT_IDS = [
    "similarity_lsh_bucketed",
]


def test_r8_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND8_CHANGED_IDS + ROUND8_R4_COHORT_IDS + ROUND8_R5_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r8():
    """Every registry id either has a driver row from r1–r7 or sits in
    the r8 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r8 slot: {never}"


def test_r8_window_covers_every_pre_r5_certification():
    """The oldest-first policy invariant: after r8 lands green, no op's
    latest driver certification is older than round 5."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 4 and n not in prefix]
    assert not stale, f"pre-r5 certifications left outside the r8 window: {stale}"


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
