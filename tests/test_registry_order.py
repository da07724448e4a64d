"""Registry-order pins.

The driver's per-round correctness run checks a bounded PREFIX of the
registry (50 entries), and `__spark_entry__.queries()` emits registry
insertion order verbatim — so ordering is part of the external
verification contract, not cosmetics. These tests pin the round-15
window under the formalized policy (VERDICT r6 item 3): every op whose
impl/oracle text changed gets a slot, then oldest-driver-certification
first — with the twelve staleness-5 r10 residents hoisted to the very
head this round per VERDICT r14 item 1.

Rotation history (which green residents fund which new slots) lives in
the comment block of ``operators/__init__.py:_RECHECK_FIRST``.
"""

from __future__ import annotations

import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators as ops
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)

WINDOW = 50

#: staleness tier — the twelve r10-cohort residents whose r10 driver
#: rows are the oldest certifications anywhere (staleness 5 entering
#: r15): tfidf_top_terms and theil_sen_slope were evicted from the r14
#: window to fund the BPE-trainer and residual-IVFADC slots; the other
#: ten slipped it. They lead the window, ahead even of the changed
#: tier.
ROUND15_STALE_IDS = [
    "tfidf_top_terms",
    "theil_sen_slope",
    "time_weighted_avg",
    "token_pmi_topk",
    "topk_per_group",
    "tpch_q1",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "weighted_sample_topk",
    "zorder_interleave",
]

#: changed-text tier — fresh driver rows REQUIRED.
ROUND15_CHANGED_IDS = [
    # NEW this round (VERDICT r14 item 2): the BPE trainer's consumer —
    # apply the learned merge table to the per-source word table with
    # the identical fold (rules as driver-scale LITERALS, joinless
    # plan), emit per-source token statistics; oracle = the trainer's
    # CTE chain shared verbatim + an e-chain applying each rule
    "bpe_encode_corpus",
    # NEW (r15, second tranche): the learned vocabulary artifact —
    # distinct symbols after all merges, corpus-weighted counts,
    # merge-product flag; same joinless literal-fold shape
    "bpe_vocab_topk",
    # recert for the r15 impl change (ADVICE r14: per-round
    # localCheckpoint blocks were unreleasable — DataFrame.unpersist is
    # a no-op on them — so rounds now persist MEMORY_AND_DISK and free
    # the superseded round; exactly one round's vocab stays cached) and
    # the oracle-chain refactor into _bpe_chain_sql (generated SQL
    # verified byte-identical against the r14 HEAD)
    "bpe_train_merges",
]

#: oldest-first refresh: ALL 34 r11-cohort residents (staleness 4
#: entering r15) fit this window, alphabetical.
ROUND15_R11_COHORT_IDS = [
    "anti_join_inactive_customers",
    "approx_distinct_bound",
    "approx_quantile_bound",
    "basket_concentration_hhi",
    "brand_revenue_share",
    "cube_status_priority",
    "doc_chunk_explode",
    "embedding_int8_quantize",
    "embedding_neardup_topk",
    "filter_group_avg_topk",
    "group_sum2_unpivot",
    "hash_train_test_split",
    "mixture_resample",
    "multimodal_frame_sample",
    "multimodal_meta",
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

#: the one remaining slot: the alphabetical head of the 46-op r12
#: cohort (the next-oldest rows); the other 45 lead the r16 window per
#: the pinned plan.
ROUND15_R12_COHORT_HEAD_IDS = [
    "asof_join_attribution",
]


def test_r15_window_is_exactly_the_planned_fifty():
    prefix = list(REGISTRY)[:WINDOW]
    planned = (
        ROUND15_STALE_IDS
        + ROUND15_CHANGED_IDS
        + ROUND15_R11_COHORT_IDS
        + ROUND15_R12_COHORT_HEAD_IDS
    )
    assert len(planned) == WINDOW
    assert prefix == planned, [
        (i, a, b) for i, (a, b) in enumerate(zip(prefix, planned)) if a != b
    ]


def test_recheck_list_fits_the_window():
    """ADVICE r7 item 5: the r7 list held 54 ids against a 50-slot
    window, silently starving the last four — the list must never
    exceed the window again."""
    assert len(ops._RECHECK_FIRST) <= WINDOW


def test_no_registry_entry_left_unchecked_after_r15():
    """Every registry id either has a driver row from r1–r14 or sits in
    the r15 window — no op can reach the judge without certification."""
    import glob
    import json
    import os

    seen = set()
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        seen |= set(json.load(open(f)))
    prefix = set(list(REGISTRY)[:WINDOW])
    never = [n for n in REGISTRY if n not in seen and n not in prefix]
    assert not never, f"ids with no driver row and no r15 slot: {never}"


def test_r15_window_covers_every_pre_r11_certification():
    """The oldest-first policy invariant: after r15 lands green, no
    op's latest driver certification is older than round 11 — and
    since the full r11 cohort also fits this window, none older than
    round 12 (the 44 r12 residents outside the window keep their r12
    rows and lead the r16 window per the pinned plan)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    stale = [n for n in REGISTRY if latest.get(n, 0) <= 11 and n not in prefix]
    assert not stale, f"pre-r12 certifications left outside the r15 window: {stale}"


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
