"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-12
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the seven staleness-5 r7 slips hoisted to the very head
this round per VERDICT r11 item 1.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the nine r6-cohort TPC-H ops that slipped the r10
#: window. Their r6 driver rows are the oldest certifications anywhere
#: (staleness 5 entering r11), and r5→r6 proved the driver environment
#: catches what local runs don't — so they lead the window, ahead even
#: of the changed tier.
ROUND12_STALE_IDS = [
    "streaming_countmin_replay",
    "streaming_dedup_replay",
    # streaming_hour_rollup also changed text this round (the
    # approx-distinct users column, VERDICT r11 item 4) — one slot
    # satisfies both tiers
    "streaming_hour_rollup",
    "streaming_sessionization",
    "streaming_view_purchase_join",
    "text_lang_id",
    "window_moving_avg",
]

#: changed-text tier — fresh driver rows REQUIRED.
ROUND12_CHANGED_IDS = [
    # NEW this round (VERDICT r11 item 2): the maintained-store /
    # self-deduplicating-ingest form of the streaming near-dup —
    # per-source probe + band append to a persisted banded store,
    # per-state hot-bucket cap, _BANDED_MAINT_SQL_TAIL oracle
    "streaming_neardup_store_maintenance",
    # the four ADVICE r11 closures (substr lockstep, temp hygiene,
    # chunk-cache fingerprint, single-checkpoint store) + the
    # tokenizer-pair migration below
    "streaming_neardup_probe",
    # \x0B dialect-class burn-down tranche 1 (VERDICT r11 item 3):
    # migrated to the explicit ASCII-whitespace-class twin pair —
    # these two ride the migrated _SIMHASH_SIG_SQL_CTES
    "text_simhash",
    "simhash_near_pairs",
    # ...and these five migrate their own oracles/impls directly
    "doc_fingerprint",
    "text_token_count",
    "text_quality_score",
    "vocab_oov_rate",
    "source_vocab_overlap",
    # _capped_bands grew checkpoint= (ADVICE r11 item 4): helper
    # signature growth recertifies the banded-tail consumers
    "image_phash_neardup",
    "audio_fingerprint_neardup",
    # _y4m_header hardened (r12 fuzz patrol: negative-dimension headers
    # were accepted instead of raising into the opaque quarantine) —
    # its two consumers recertify — and the sibling sweep hardened
    # _ppm_parse / _bmp_parse, so their decode ops recertify too
    "multimodal_decode_dispatch",
    "video_frame_sample",
    "multimodal_ppm_decode",
    "multimodal_bmp_decode",
]

#: oldest-first refresh: the r8 cohort (staleness 4 entering r12).
#: vocab_oov_rate sits in the changed tier; the seven alphabetically
#: last residents (trend_group_avg_sort, two_level_agg,
#: user_event_paths, value_counts_topk, window_group_median_fill,
#: window_lag_value_delta, zscore_normalize) are evicted to lead r13.
ROUND12_R8_COHORT_IDS = [
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
    "json_props_extract",
    "mad_outlier_detect",
    "overview_scalars",
    "pivot_event_counts",
    "project_dropna",
    "range_filter_agg",
    "running_distinct_users",
    "salted_skew_agg",
    "salted_skew_join",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "stratified_hash_sample",
]


def test_r12_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND12_STALE_IDS + ROUND12_CHANGED_IDS + ROUND12_R8_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r12():
    """Every registry id either has a driver row from r1–r11 or sits in
    the r12 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r12 slot: {never}"


def test_r12_window_covers_every_pre_r8_certification():
    """The oldest-first policy invariant: after r12 lands green, no
    op's latest driver certification is older than round 8 (the seven
    evicted r8 residents — trend_group_avg_sort, two_level_agg,
    user_event_paths, value_counts_topk, window_group_median_fill,
    window_lag_value_delta, zscore_normalize — keep their r8 rows and
    lead the r13 window)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 7 and n not in prefix]
    assert not stale, f"pre-r8 certifications left outside the r12 window: {stale}"


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
