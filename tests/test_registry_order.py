"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-16
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the one r11-cohort resident whose driver row is the
#: oldest certification anywhere (staleness 5 entering r16): tpch_q8
#: was evicted from the r15 window to fund the perplexity-tercile and
#: unigram-recert slots and leads r16 per the pinned plan.
ROUND16_STALE_IDS = [
    "tpch_q8",
]

#: changed-text tier — fresh driver rows REQUIRED (policy a — it
#: outranks the pinned cohort-first ordering note, per VERDICT r15
#: item 2: "new ops take priority per policy a").
ROUND16_CHANGED_IDS = [
    # NEW this round (VERDICT r15 item 2): the eight classic TPC-H
    # shapes the suite lacked — operators/tpch.py now covers all 22.
    # Q2 correlated scalar-subquery MIN (decorrelated to a min window
    # over the semi-pruned pair table), Q4 EXISTS→left semi, Q9 LIKE-filtered profit
    # rollup, Q11 HAVING vs global-share scalar subquery (grid-rounded
    # threshold compare), Q12 CASE-pivot counts, Q16 NOT IN→broadcast
    # left anti on a non-null key, Q20 nested IN chain→semi-join
    # ladder with the correlated threshold as a same-pass conditional
    # sum, Q21 multi-EXISTS/NOT-EXISTS→co-partitioned left semi +
    # left anti self-joins with the suppkey inequality as residual.
    "tpch_q2",
    "tpch_q4",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    # recert for the r16 impl change (ADVICE r15 item 3: the
    # histogram now lives in a single-slot (session, sf_dir)-keyed
    # persist cache — same-key repeats reuse the shared cache-manager
    # entry, different-key calls evict and release)
    "perplexity_tercile_split",
    # NEW (r16, second tranche): the MinHash estimator-calibration
    # measurement — matching-slot count vs exact token-set Jaccard per
    # banded candidate pair, rolled up per slot count; shares the
    # banded-candidate builders and the _minhash_chain_sql oracle
    # chain with the near-dup op
    "minhash_jaccard_calibration",
    # recert for the r16 factoring (shared builders + oracle chain;
    # generated oracle SQL verified byte-identical to the pre-factor
    # text)
    "dedup_minhash_lsh",
]

#: oldest-first refresh: 38 of the 46 r12-cohort residents (staleness
#: 4 entering r16), alphabetical; the tail 8
#: (streaming_view_purchase_join, text_lang_id, text_quality_score,
#: text_simhash, text_token_count, video_frame_sample, vocab_oov_rate,
#: window_moving_avg) slip to lead the r17 window per the pinned plan
#: — the last two evicted to fund the calibration-op and
#: minhash-recert slots.
ROUND16_R12_COHORT_IDS = [
    "asof_join_attribution",
    "cohort_retention",
    "corr_matrix",
    "dedup_exact",
    "doc_fingerprint",
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
    "image_phash_neardup",
    "json_props_extract",
    "mad_outlier_detect",
    "multimodal_bmp_decode",
    "multimodal_ppm_decode",
    "overview_scalars",
    "pivot_event_counts",
    "project_dropna",
    "range_filter_agg",
    "running_distinct_users",
    "salted_skew_agg",
    "salted_skew_join",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "simhash_near_pairs",
    "source_vocab_overlap",
    "stratified_hash_sample",
    "streaming_countmin_replay",
    "streaming_dedup_replay",
    "streaming_neardup_probe",
    "streaming_sessionization",
]


def test_r16_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND16_STALE_IDS + ROUND16_CHANGED_IDS + ROUND16_R12_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r16():
    """Every registry id either has a driver row from r1–r15 or sits in
    the r16 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r16 slot: {never}"


def test_r16_window_covers_every_pre_r12_certification():
    """The oldest-first policy invariant: after r16 lands green, no
    op's latest driver certification is older than round 12, and
    exactly EIGHT r12 rows remain outside the window — the
    alphabetical cohort tail evicted to fund the eight new TPC-H
    slots, the tercile recert, the calibration op, and the minhash
    recert; they lead the r17 window per the pinned plan (the same
    bounded-staleness eviction as tpch_q8 in r15)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    pre_r12 = [n for n in REGISTRY if latest.get(n, 0) <= 11 and n not in prefix]
    assert not pre_r12, f"pre-r12 certifications left outside the r16 window: {pre_r12}"
    r12_left = sorted(n for n in REGISTRY if latest.get(n, 0) == 12 and n not in prefix)
    assert r12_left == [
        "streaming_view_purchase_join",
        "text_lang_id",
        "text_quality_score",
        "text_simhash",
        "text_token_count",
        "video_frame_sample",
        "vocab_oov_rate",
        "window_moving_avg",
    ], f"unplanned r12 evictions: {r12_left}"


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
