"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-9
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

#: changed-text tier — fresh driver rows REQUIRED. Three r9 families:
#: (1) the shingle/token helper unification (VERDICT r8 item 1 —
#: text.ws_token_count / word3_shingles hoisted, all former mirrors now
#: import them); (2) the leakage/cross-entropy work (items 3-4 +
#: ADVICE: NEW split_leakage_lsh and bigram_cross_entropy_hashed;
#: round_cmp threshold in split_leakage_check; localCheckpoint caveats;
#: the exact bigram op on the hoisted pair builder); (3) the quantile
#: consolidation (item 6 — functions/rank_math.py carries invariant 6
#: once, and the selection engine's histogram/boundary transport moved
#: to Arrow bincount partials) pulling in every engine consumer;
#: plus the late token-definition fixes (\S+ run-counting in the
#: shared pair and in text_repetition_flags's word array).
ROUND9_CHANGED_IDS = [
    "text_token_count",
    "text_quality_score",
    "doc_self_repetition",
    "corpus_curation",
    "truncation_loss_curve",
    "sequence_pack_stats",
    "sequence_pack_scaled",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "text_repetition_flags",
    "split_leakage_lsh",
    "bigram_cross_entropy_hashed",
    "split_leakage_check",
    "similarity_lsh_bucketed",
    "dedup_minhash_lsh",
    "bigram_cross_entropy",
    "unigram_cross_entropy",
    "median_fill",
    "iqr_clip",
    "quantile_profile",
    "median_fill_scaled",
    "iqr_clip_scaled",
    "group_quantiles_scaled",
    "source_quantile_normalize",
]

#: oldest-first refresh: the r5 cohort (staleness 3 entering r9 — the
#: oldest anywhere). 26 of its 32 fit; the alphabetically-last six
#: (snapshot_diff, source_vocab_overlap, text_simhash, token_pmi_topk,
#: weighted_sample_topk, zorder_interleave) slip to r10 and lead its
#: window.
ROUND9_R5_COHORT_IDS = [
    "assoc_rules_lift",
    "benford_law_check",
    "bpe_pair_counts",
    "brand_copurchase_triangles",
    "cdc_latest_compaction",
    "countmin_estimate",
    "cusum_changepoint",
    "dedup_semantic_cluster",
    "ewma_smoothing",
    "heavy_hitters_twopass",
    "incremental_agg_update",
    "inverted_index_topk",
    "kmv_distinct_sketch",
    "kmv_join_cardinality",
    "largest_remainder_alloc",
    "mann_kendall_trend",
    "merge_upsert_counts",
    "mode_per_group",
    "pagerank_nation_trade",
    "path_regex_match",
    "rolling_correlation",
    "scd2_dimension_update",
    "sessionization",
    "simhash_near_pairs",
    "similarity_ivf_topk",
    "skyline_pareto",
]


def test_r9_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = ROUND9_CHANGED_IDS + ROUND9_R5_COHORT_IDS
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r9():
    """Every registry id either has a driver row from r1–r8 or sits in
    the r9 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r9 slot: {never}"


def test_r9_window_covers_every_pre_r5_certification():
    """The oldest-first policy invariant: after r9 lands green, no op's
    latest driver certification is older than round 5 (the six r5 ops
    that slipped keep their r5 rows and lead the r10 window)."""
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
    assert not stale, f"pre-r5 certifications left outside the r9 window: {stale}"


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
