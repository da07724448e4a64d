"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-14
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the fourteen staleness-5 r9 residents hoisted to the very
head this round per VERDICT r13 item 1.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the fourteen r9-cohort residents whose r9 driver
#: rows are the oldest certifications anywhere (staleness 5 entering
#: r14): the twelve that slipped the r13 window plus the two evicted
#: in r13 to fund the similarity_pq_topk slot and the
#: audio_fingerprint_neardup recert. They lead the window, ahead even
#: of the changed tier.
ROUND14_STALE_IDS = [
    "merge_upsert_counts",
    "mode_per_group",
    "pagerank_nation_trade",
    "path_regex_match",
    "rolling_correlation",
    "scd2_dimension_update",
    "sessionization",
    "similarity_ivf_topk",
    "similarity_lsh_bucketed",
    "skyline_pareto",
    "source_quantile_normalize",
    "split_leakage_check",
    "split_leakage_lsh",
    "unigram_cross_entropy",
]

#: changed-text tier — fresh driver rows REQUIRED.
ROUND14_CHANGED_IDS = [
    # NEW this round (VERDICT r13 item 2): the composed IVF-ADC ANN
    # serve path — coarse cells bound WHICH vectors are scored, PQ
    # codes bound WHAT is read per scored vector, exact re-rank
    # refines the shortlist; both quantizer fits REUSED byte-identical
    # from the certified halves (shared fit cache), oracle = CTE merge
    # of the two certified chains
    "similarity_ivf_pq_topk",
    # NEW (r14, second tranche): the residual-encoded IVFADC variant —
    # codebooks fit on v - centroid[cell] residual slices, one query
    # residual per probed cell, same pinned serve plan; certifies the
    # residual machinery (the docstring records the honest negative
    # recall result on this isotropic corpus)
    "similarity_ivf_pq_residual_topk",
    # shared-helper refactor (_pq_chains_sql/_pq_slice_proj/_adc_expr/
    # _exact_rerank now serve both the flat and composed ops; the
    # generated oracle SQL was verified byte-identical), the ADVICE
    # r13 'triad' docstring fix, and the shortlist retune (20x TOP_K:
    # recall@5 0.68 -> 0.82)
    "similarity_pq_topk",
    # ADVICE r13 cache-key hardening: the initial-store cache key now
    # folds in the LIVE band geometry (dedup._SIMHASH_BANDS/_BAND_BITS
    # read at call time), so an in-process geometry change
    # self-invalidates the cached store — both store-lifecycle ops
    # recertify
    "streaming_neardup_store_maintenance",
    "streaming_neardup_store_compaction",
    # NEW (r14, third tranche): the iterated BPE tokenizer trainer —
    # N greedy count/argmax/merge rounds, integer-count determinism,
    # cross-engine-pinned replace overlap semantics, unrolled-CTE
    # oracle like the k-means chains
    "bpe_train_merges",
]

#: oldest-first refresh: 30 of the 42 r10-cohort residents (staleness
#: 4 entering r14), alphabetical. The twelve that do not fit
#: (tfidf_top_terms and theil_sen_slope — evicted to fund the
#: BPE-trainer and residual-IVFADC slots — plus time_weighted_avg ..
#: zorder_interleave) slip to lead the r15 window — the plan is
#: pinned in the _RECHECK_FIRST rotation comment.
ROUND14_R10_COHORT_IDS = [
    "abtest_proportions_ztest",
    "attribution_position_based",
    "bloom_filter_semi_join",
    "bootstrap_mean_ci",
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
    "iqr_clip",
    "km_survival_estimate",
    "median_fill",
    "ntile_quartiles",
    "quantile_profile",
    "range_interval_window",
    "rank_auc_mann_whitney",
    "seasonal_baseline_anomaly",
    "shannon_entropy_profile",
    "skew_diagnosis_gini",
    "snapshot_diff",
    "source_jsd_pairs",
    "spearman_rank_corr",
    "star_join_revenue",
    "supplier_revenue_rank",
    "term_frequency_topk",
]


def test_r14_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND14_STALE_IDS + ROUND14_CHANGED_IDS + ROUND14_R10_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r14():
    """Every registry id either has a driver row from r1–r13 or sits in
    the r14 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r14 slot: {never}"


def test_r14_window_covers_every_pre_r10_certification():
    """The oldest-first policy invariant: after r14 lands green, no
    op's latest driver certification is older than round 10 (the
    twelve r10 residents that slipped this window keep their r10 rows
    and lead the r15 window per the pinned plan)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 9 and n not in prefix]
    assert not stale, f"pre-r10 certifications left outside the r14 window: {stale}"


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
