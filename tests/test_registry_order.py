"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-10
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the six staleness-4 r5 slips hoisted to the very head this
round per VERDICT r9 item 1.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the six r5-cohort ops that slipped the r9 window.
#: Their r5 driver rows are the oldest certifications anywhere
#: (staleness 4 entering r10), and r5→r6 proved the driver environment
#: catches what local runs don't — so they lead the window, ahead even
#: of the changed tier.
ROUND10_STALE_IDS = [
    "snapshot_diff",
    "source_vocab_overlap",
    "text_simhash",
    "token_pmi_topk",
    "weighted_sample_topk",
    "zorder_interleave",
]

#: changed-text tier — fresh driver rows REQUIRED.
#: split_leakage_ngram is NEW this round (VERDICT r9 item 4): the
#: text-level cross-split shingle-hash contamination audit composing
#: the md5 doc_id split, the shared text.word3_shingles pair, and the
#: dedup index's hot-shingle DF cap.
ROUND10_CHANGED_IDS = [
    "split_leakage_ngram",
    # aHash image near-dup over the certified BMP decode + the shared
    # simhash banding (VERDICT r9 item 8 stretch)
    "image_phash_neardup",
    # audio twin (late r10): WAV frame-energy-delta fingerprint into
    # the same banding — multimodal near-dup family closed over its
    # third modality
    "audio_fingerprint_neardup",
    # shared-helper extraction (r10 review): Spark body rewritten to
    # _banded_hamming_pairs; oracle byte-identical, policy (a) anyway
    "simhash_near_pairs",
    # real Y4M container decode + K-frame sampling (late r10): the
    # fourth multimodal modality
    "video_frame_sample",
    # selection-engine consumers: rank_math.rank_spec (Python dialect)
    # moved int() → math.floor + p∈[0,1] assert (ADVICE r9); identical
    # on the valid domain and lockstep-pinned, but policy (a) admits no
    # exceptions
    "median_fill",
    "iqr_clip",
    "quantile_profile",
]

#: oldest-first refresh: the r6 cohort (staleness 3 entering r10 — the
#: oldest behind the hoisted r5 six). 36 of its 45 fit after the late
#: audio + video ops and the simhash shared-helper refactor took
#: changed-tier slots; the alphabetically-last nine (tpch_q17,
#: tpch_q18, tpch_q19, tpch_q22, tpch_q3, tpch_q5, tpch_q6, tpch_q7,
#: tpch_q8) slip to r11 and lead its window.
ROUND10_R6_COHORT_IDS = [
    "abtest_proportions_ztest",
    "attribution_position_based",
    "bloom_filter_semi_join",
    "bootstrap_mean_ci",
    "c4_heuristic_filter",
    "chi_square_independence",
    "column_profile",
    "cume_dist_price_bands",
    "encoding_run_stats",
    "entity_resolution_blocked",
    "fd_discovery",
    "gaps_islands_streaks",
    "grouping_sets_agg",
    "histogram_fixed_width",
    "interval_concurrency_peak",
    "km_survival_estimate",
    "ntile_quartiles",
    "range_interval_window",
    "rank_auc_mann_whitney",
    "seasonal_baseline_anomaly",
    "shannon_entropy_profile",
    "skew_diagnosis_gini",
    "source_jsd_pairs",
    "spearman_rank_corr",
    "star_join_revenue",
    "supplier_revenue_rank",
    "term_frequency_topk",
    "tfidf_top_terms",
    "theil_sen_slope",
    "time_weighted_avg",
    "topk_per_group",
    "tpch_q1",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
]


def test_r10_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND10_STALE_IDS + ROUND10_CHANGED_IDS + ROUND10_R6_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r10():
    """Every registry id either has a driver row from r1–r9 or sits in
    the r10 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r10 slot: {never}"


def test_r10_window_covers_every_pre_r6_certification():
    """The oldest-first policy invariant: after r10 lands green, no
    op's latest driver certification is older than round 6 (the nine
    r6 ops that slipped — tpch_q17/q18/q19/q22/q3/q5/q6/q7/q8 — keep
    their r6 rows and lead the r11 window)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 5 and n not in prefix]
    assert not stale, f"pre-r6 certifications left outside the r10 window: {stale}"


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
