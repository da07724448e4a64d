# Importing populates the query registry. IMPORT ORDER IS LOAD-BEARING:
# the registry dict preserves insertion order, `__spark_entry__.queries()`
# emits it verbatim, and the driver's per-round correctness run checks a
# bounded prefix (first 50 in round 1). Modules are therefore ordered by
# verification priority, NOT alphabetically:
#
#   1. relational  — every SURVEY §2 core parity operator (r1: unchecked)
#   2. scaled      — 100 TB-path variants needing driver certification
#   3. prep/similarity/skew/multimodal — r1: past the window, unchecked
#   4. text/dedup/curation/advanced/events/joins — all driver-green in r1
#
# New round-N queries that need a fresh driver row belong in (or before)
# tier 2/3 modules so they land inside the checked prefix.
from . import relational  # noqa: F401  (tier 1: SURVEY §2 parity)
from . import scaled  # noqa: F401  (tier 2: driver-certified scale paths)
from . import prep, similarity, skew, multimodal  # noqa: F401  (tier 3)
from . import text, dedup, curation, advanced, events, joins  # noqa: F401  (tier 4: green in r1)
from . import warehouse  # noqa: F401  (tier 5: r5 maintenance family — hoisted into the window via _RECHECK_FIRST)
from . import tpch  # noqa: F401  (tier 5: classic TPC-H shapes — local oracle this round, window rotation next)
from . import mining  # noqa: F401  (tier 5: r5 sketch/interval/skyline family)

from .registry import REGISTRY as _R

#: ids that must occupy the driver's 50-entry correctness-window PREFIX,
#: in priority order. WINDOW POLICY (formalized in r7, VERDICT r6 item
#: 3): (a) every op whose impl or oracle text changed this round gets a
#: slot — no exceptions; (b) the remaining slots go to
#: OLDEST-DRIVER-CERTIFICATION-FIRST, so no op's latest driver row can
#: age past ~3 rounds as the rotation cycles.
#: r13 window recap: the seven r8-stale evictees + the tranche-2
#: tokenizer burn-down (16 recerts, legacy pair deleted) + the HLL
#: envelope derivation + the compaction op (new) + the WAV hardening
#: recerts + similarity_pq_topk (new) + 20 of the r9 cohort — 50/50
#: green, in pinned order.
_RECHECK_FIRST = [
    # r14 window (EXACTLY 50 ids), per the plan pinned at the end of
    # the r13 rotation comment and VERDICT r13 item 1:
    # — staleness tier FIRST (policy b): the fourteen r9 residents
    #   whose driver rows are the oldest anywhere (staleness 5
    #   entering r14) — the twelve that slipped the r13 window plus
    #   merge_upsert_counts and mode_per_group (evicted in r13 to fund
    #   the similarity_pq_topk slot and the audio_fingerprint_neardup
    #   recert), alphabetical within the equal-staleness tie —
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
    # — changed-text tier (policy a):
    #   similarity_ivf_pq_topk is NEW (r14, VERDICT r13 item 2): the
    #   composed IVF-ADC serve path — coarse cells bound WHICH vectors
    #   are scored, PQ codes bound WHAT is read per vector, exact
    #   re-rank refines; both quantizer fits are REUSED byte-identical
    #   from the certified halves, and the oracle is a CTE merge of the
    #   two certified chains;
    #   similarity_pq_topk recertifies for the shared-helper refactor
    #   (_pq_chains_sql/_pq_slice_proj/_adc_expr/_exact_rerank now
    #   serve both the flat and the composed op; generated oracle SQL
    #   verified byte-identical), the ADVICE r13 'triad' wording fix,
    #   and the shortlist retune (10x -> 20x TOP_K: recall@5
    #   0.68 -> 0.82, closing VERDICT r13's low-ish-recall residual;
    #   re-rank cost stays |queries|x shortlist, trivial);
    #   the two maintained-store ops recertify for the ADVICE r13
    #   cache-key hardening (the initial-store cache key now folds in
    #   the LIVE band geometry, so an in-process geometry change
    #   self-invalidates instead of serving a stale store) —
    "similarity_ivf_pq_topk",
    #   similarity_ivf_pq_residual_topk is NEW (r14, second tranche):
    #   the residual-encoded IVFADC variant — codebooks fit on
    #   v - centroid[cell] slices, per-(query, probed-cell) query
    #   residuals, same pinned serve plan; certified with the honest
    #   measurement that residuals rank WORSE at tight shortlists on
    #   this isotropic corpus (the machinery, not a recall win, is the
    #   certified artifact) —
    "similarity_ivf_pq_residual_topk",
    "similarity_pq_topk",
    "streaming_neardup_store_maintenance",
    "streaming_neardup_store_compaction",
    #   bpe_train_merges is NEW (r14, third tranche): the full iterated
    #   BPE tokenizer trainer — N greedy count/argmax/merge rounds over
    #   the distinct-word table, integer-count determinism (no FP
    #   pins), padded-symbol-string merge via builtin replace whose
    #   overlap semantics are pinned identical cross-engine; oracle
    #   unrolls all rounds as CTEs like the k-means chains —
    "bpe_train_merges",
    # — r10-cohort tier (policy b: oldest-first, alphabetical within
    #   the equal-staleness tie; 30 of the 42 r10 residents fit the
    #   remaining slots after the residual-IVFADC and BPE-trainer
    #   slots) —
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
    # — r15 window plan (pinned now so the rotation stays mechanical):
    #   FIRST the twelve r10 residents that slipped this window
    #   (tfidf_top_terms and theil_sen_slope — evicted to fund the
    #   BPE-trainer and residual-IVFADC slots — plus time_weighted_avg,
    #   token_pmi_topk, topk_per_group, tpch_q1, tpch_q10, tpch_q13,
    #   tpch_q14, tpch_q15, weighted_sample_topk, zorder_interleave —
    #   staleness 5 entering r15, the oldest rows anywhere), then r15
    #   changed-text, then the 34-op r11 cohort alphabetical with the
    #   remaining ~34 slots (its tail lands in r16, the same two-round
    #   drain as the r9 and r10 cohorts).
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
