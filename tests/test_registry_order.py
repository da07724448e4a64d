"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-11
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the nine staleness-5 r6 TPC-H slips hoisted to the very
head this round per VERDICT r10 item 1.

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
ROUND11_STALE_IDS = [
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
]

#: changed-text tier — fresh driver rows REQUIRED.
ROUND11_CHANGED_IDS = [
    # NEW this round (VERDICT r10 item 4): incremental/streaming
    # near-dup — ingest sources replayed as micro-batches, each probed
    # against the historical banded signature store via
    # _banded_hamming_pairs probe mode + _BANDED_PROBE_SQL_TAIL
    "streaming_neardup_probe",
    # pipeline extracted to text.simhash_sig (shared with the streaming
    # probe); oracle now interpolates the shared _SIMHASH_SIG_SQL_CTES
    "text_simhash",
    # _banded_hamming_pairs grew the probe parameter (self-join path
    # plan-identical); oracle rides the shared sig CTE block
    "simhash_near_pairs",
    # _hashed_src gained the Spark Connect guard (ADVICE r10); the WAV
    # PCM body moved to the C-speed slice idiom (VERDICT r10 item 2);
    # the Y4M header walk was hoisted into the shared _y4m_header
    "image_phash_neardup",
    "audio_fingerprint_neardup",
    "video_frame_sample",
    # docstring correction only (ADVICE r10: leaked_share carries the
    # accepted ROUND exposure) — policy (a) admits no exceptions
    "split_leakage_ngram",
    # r7 cohort members whose text ALSO changed: the Y4M magic +
    # oracle stratum, and the C-speed _wav_encode
    "multimodal_decode_dispatch",
    "multimodal_wav_decode",
]

#: oldest-first refresh: the r7 cohort (staleness 4 entering r11 — the
#: oldest behind the hoisted TPC-H nine). 32 of its remaining 39 fit
#: after the changed tier took nine slots; the alphabetically-last
#: seven (streaming_countmin_replay, streaming_dedup_replay,
#: streaming_hour_rollup, streaming_sessionization,
#: streaming_view_purchase_join, text_lang_id, window_moving_avg) slip
#: to r12 and lead its window.
ROUND11_R7_COHORT_IDS = [
    "anti_join_inactive_customers",
    "approx_distinct_bound",
    "approx_quantile_bound",
    "basket_concentration_hhi",
    "brand_revenue_share",
    "contamination_ngram_check",
    "cube_status_priority",
    "dedup_common_spans",
    "dedup_exact_text",
    "dedup_incremental",
    "doc_chunk_explode",
    "doc_fingerprint",
    "embedding_int8_quantize",
    "embedding_neardup_topk",
    "filter_group_avg_topk",
    "group_sum2_unpivot",
    "hash_train_test_split",
    "mixture_resample",
    "multimodal_bmp_decode",
    "multimodal_frame_sample",
    "multimodal_meta",
    "multimodal_ppm_decode",
    "percent_rank_band",
    "pii_scrub_digits",
    "range_band_join",
    "regr_linear_fit",
    "rfm_segments",
    "rollup_status_priority",
    "shard_assignment_balance",
    "similarity_bruteforce_topk",
    "source_mixture_weights",
    "streaming_cdc_compaction",
]


def test_r11_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND11_STALE_IDS + ROUND11_CHANGED_IDS + ROUND11_R7_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r11():
    """Every registry id either has a driver row from r1–r10 or sits in
    the r11 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r11 slot: {never}"


def test_r11_window_covers_every_pre_r7_certification():
    """The oldest-first policy invariant: after r11 lands green, no
    op's latest driver certification is older than round 7 (the seven
    r7 ops that slipped — the five streaming replays, text_lang_id,
    window_moving_avg — keep their r7 rows and lead the r12 window)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 6 and n not in prefix]
    assert not stale, f"pre-r7 certifications left outside the r11 window: {stale}"


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
