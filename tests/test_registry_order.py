"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-13
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the seven staleness-5 r8 evictees hoisted to the very
head this round per VERDICT r12 item 1.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the seven r8-cohort ops evicted from the r12 window
#: to fund its recert slots. Their r8 driver rows are the oldest
#: certifications anywhere (staleness 5 entering r13), so they lead the
#: window, ahead even of the changed tier.
ROUND13_STALE_IDS = [
    "trend_group_avg_sort",
    "two_level_agg",
    "user_event_paths",
    "value_counts_topk",
    "window_group_median_fill",
    "window_lag_value_delta",
    "zscore_normalize",
]

#: changed-text tier — fresh driver rows REQUIRED.
ROUND13_CHANGED_IDS = [
    # \x0B tokenizer burn-down TRANCHE 2 (VERDICT r12 item 1): the 15
    # remaining legacy-pair consumers + text_repetition_flags's inline
    # \S+ migrated to the explicit ASCII-whitespace-class pair; the
    # legacy \s-based pair is DELETED and the divergence pin flipped to
    # the no-\s-idiom-in-any-oracle agreement guard. Spark results are
    # bit-identical; only the DuckDB oracle texts changed.
    "bpe_pair_counts",
    "c4_heuristic_filter",
    "contamination_ngram_check",
    "corpus_curation",
    "dedup_common_spans",
    "dedup_connected_components",
    "dedup_exact_text",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "doc_self_repetition",
    "sequence_pack_scaled",
    "sequence_pack_stats",
    "split_leakage_ngram",
    "text_repetition_flags",
    "truncation_loss_curve",
    # the HLL certification envelope is now DERIVED from the sketch's
    # rsd (4*rsd relative + 5-user absolute floor, ADVICE r12 item 3)
    "streaming_hour_rollup",
    # oracle hoisted to the shared _MAINT_ORACLE constant (same SQL
    # text) + docstring tie to the new compaction op
    "streaming_neardup_store_maintenance",
    # NEW this round (VERDICT r12 item 3): the answer-preserving
    # OPTIMIZE of the maintained banded store — fault-injected
    # duplicate appends, mid-stream compaction, certified against the
    # maintenance oracle VERBATIM
    "streaming_neardup_store_compaction",
    # r13 WAV fuzz patrol (VERDICT r12 item 6) hardened the header
    # walk (fmt_len validation, odd-data_len reject), and the round
    # review then routed the fingerprint reader's own unvalidated copy
    # of the walk through the shared _wav_header_walk — all three WAV
    # consumers recertify
    "multimodal_wav_decode",
    "multimodal_decode_dispatch",
    "audio_fingerprint_neardup",
    # NEW (r13): product-quantization ADC ANN with exact re-rank —
    # completes the exact/IVF/LSH/PQ index-family triad; oracle replays
    # all eight per-subspace codebook fits as unrolled CTE chains
    "similarity_pq_topk",
]

#: oldest-first refresh: the r9 cohort (staleness 4 entering r13).
#: Ten r9 residents already sit in the changed tier (the tranche-2
#: migration doubles as r9 drain); the fourteen remaining residents
#: (merge_upsert_counts and mode_per_group — evicted to fund the
#: similarity_pq_topk slot and the audio_fingerprint_neardup recert —
#: plus pagerank_nation_trade .. unigram_cross_entropy) slip to lead
#: the r14 window — the plan is pinned in the _RECHECK_FIRST rotation
#: comment.
ROUND13_R9_COHORT_IDS = [
    "assoc_rules_lift",
    "benford_law_check",
    "bigram_cross_entropy",
    "bigram_cross_entropy_hashed",
    "brand_copurchase_triangles",
    "cdc_latest_compaction",
    "countmin_estimate",
    "cusum_changepoint",
    "dedup_semantic_cluster",
    "ewma_smoothing",
    "group_quantiles_scaled",
    "heavy_hitters_twopass",
    "incremental_agg_update",
    "inverted_index_topk",
    "iqr_clip_scaled",
    "kmv_distinct_sketch",
    "kmv_join_cardinality",
    "largest_remainder_alloc",
    "mann_kendall_trend",
    "median_fill_scaled",
]


def test_r13_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND13_STALE_IDS + ROUND13_CHANGED_IDS + ROUND13_R9_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r13():
    """Every registry id either has a driver row from r1–r12 or sits in
    the r13 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r13 slot: {never}"


def test_r13_window_covers_every_pre_r9_certification():
    """The oldest-first policy invariant: after r13 lands green, no
    op's latest driver certification is older than round 9 (the twelve
    r9 residents that slipped this window keep their r9 rows and lead
    the r14 window per the pinned plan)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 8 and n not in prefix]
    assert not stale, f"pre-r9 certifications left outside the r13 window: {stale}"


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
