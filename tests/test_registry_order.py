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
    # NEW (r15, third tranche): the CCNet-style curation action —
    # per-source head/middle/tail tercile split on unigram-LM
    # cross-entropy; histogram-selected value thresholds, no per-source
    # doc sort
    "perplexity_tercile_split",
    # recert for the r15 impl refactor (per-doc scoring now flows
    # through the shared _unigram_xent_per_doc helper; oracle SQL
    # verified byte-identical against the r14 HEAD)
    "unigram_cross_entropy",
]

#: oldest-first refresh: 33 of the 34 r11-cohort residents (staleness
#: 4 entering r15), alphabetical; tpch_q8 was evicted to fund the
#: perplexity-tercile and unigram-recert slots and leads the r16
#: window per the pinned plan.
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
]

#: no spare slots remain for the r12 cohort this round — all 46 of its
#: residents (plus the evicted tpch_q8) lead the r16 window per the
#: pinned plan.
ROUND15_R12_COHORT_HEAD_IDS: list[str] = []


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
    op's latest driver certification is older than round 11, and
    exactly ONE r11 row remains outside the window — tpch_q8, evicted
    to fund the perplexity-tercile and unigram-recert slots; it leads
    the r16 window per the pinned plan (the same bounded-staleness
    eviction as tfidf_top_terms/theil_sen_slope in r14)."""
    import glob
    import json
    import os

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f)[len("CORRECTNESS_r") : -len(".json")].lstrip("0") or "0")
        for op_name in json.load(open(f)):
            latest[op_name] = max(latest.get(op_name, 0), rnd)
    prefix = set(list(REGISTRY)[:WINDOW])
    pre_r11 = [n for n in REGISTRY if latest.get(n, 0) <= 10 and n not in prefix]
    assert not pre_r11, f"pre-r11 certifications left outside the r15 window: {pre_r11}"
    r11_left = [n for n in REGISTRY if latest.get(n, 0) == 11 and n not in prefix]
    assert r11_left == ["tpch_q8"], f"unplanned r11 evictions: {r11_left}"


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
