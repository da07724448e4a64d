"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-7
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — the full r1 and r3 cohorts plus the flagship query.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: changed-text tier — fresh driver rows REQUIRED: the frame sampler's
#: r6 oracle has never been driver-run; decode_dispatch is new this
#: round; the dedup pair gained the hot-shingle DF cap; the streaming
#: pair changed in r6 but missed the r6 window (ADVICE r6 item 1); the
#: three byte-level decodes moved from assert to ValueError validation
ROUND7_CHANGED_IDS = [
    "multimodal_frame_sample",
    "multimodal_decode_dispatch",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "streaming_hour_rollup",
    "streaming_cdc_compaction",
    "streaming_view_purchase_join",
    "streaming_dedup_replay",
    "streaming_countmin_replay",
    "streaming_sessionization",
    "multimodal_ppm_decode",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "median_fill",
    "iqr_clip",
]

#: oldest-first refresh: every op whose latest driver row dates to r1
ROUND7_R1_COHORT_IDS = [
    "anti_join_inactive_customers",
    "basket_concentration_hhi",
    "brand_revenue_share",
    "contamination_ngram_check",
    "corpus_curation",
    "cube_status_priority",
    "dedup_common_spans",
    "dedup_exact_text",
    "dedup_incremental",
    "mixture_resample",
    "percent_rank_band",
    "range_band_join",
    "regr_linear_fit",
    "rfm_segments",
    "rollup_status_priority",
    "source_mixture_weights",
    "unigram_cross_entropy",
    "window_moving_avg",
]

#: every live op whose latest driver row dates to r3 (the retired
#: multimodal_decode_stub id excluded; frame_sample sits in tier 1)
ROUND7_R3_COHORT_IDS = [
    "approx_distinct_bound",
    "approx_quantile_bound",
    "doc_chunk_explode",
    "doc_fingerprint",
    "embedding_int8_quantize",
    "embedding_neardup_topk",
    "group_sum2_unpivot",
    "hash_train_test_split",
    "multimodal_meta",
    "pii_scrub_digits",
    "shard_assignment_balance",
    "similarity_bruteforce_topk",
    "text_lang_id",
    "text_quality_score",
    "text_repetition_flags",
    "text_token_count",
]

#: SURVEY §2.4 parity flagships (r4-era rows) fill the remaining slots
ROUND7_R4_FLAGSHIP_IDS = [
    "filter_group_avg_topk",
]


def test_r7_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = (
        ROUND7_CHANGED_IDS
        + ROUND7_R1_COHORT_IDS
        + ROUND7_R3_COHORT_IDS
        + ROUND7_R4_FLAGSHIP_IDS
    )
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_no_registry_entry_left_unchecked_after_r7():
    """Every registry id either has a driver row from r1–r6 or sits in
    the r7 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r7 slot: {never}"


def test_r7_window_covers_the_full_r1_and_r3_cohorts():
    """The oldest-first policy invariant: after r7 lands green, no op's
    latest driver certification is older than round 4."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 3 and n not in prefix]
    assert not stale, f"pre-r4 certifications left outside the r7 window: {stale}"


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
