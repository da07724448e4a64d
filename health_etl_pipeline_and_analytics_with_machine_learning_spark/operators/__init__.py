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
#: r12 window recap: 7 r7-stale streaming/text ops + the tranche-1
#: tokenizer migrations + the maintained-store op (new) + the banded
#: helper split recerts (_capped_bands was DECOMPOSED into the
#: _simhash_bands + _cap_bands composition — an earlier draft grew a
#: checkpoint= parameter that was added and removed within the round;
#: ADVICE r12 corrected the stale claim) + the PPM/BMP/Y4M hardening
#: recerts + 28 of the r8 cohort.
_RECHECK_FIRST = [
    # r13 window (EXACTLY 50 ids), per the plan pinned at the end of
    # the r12 rotation comment and VERDICT r12 item 1:
    # — staleness tier FIRST (policy b): the seven r8-cohort residents
    #   evicted from the r12 window — the oldest driver rows anywhere
    #   (staleness 5 entering r13) —
    "trend_group_avg_sort",
    "two_level_agg",
    "user_event_paths",
    "value_counts_topk",
    "window_group_median_fill",
    "window_lag_value_delta",
    "zscore_normalize",
    # — changed-text tier (policy a): the \x0B tokenizer burn-down
    #   TRANCHE 2 — the 15 remaining legacy _norm/_NORM_SQL /
    #   ws_token_count/WS_TOKEN_COUNT_SQL consumers plus
    #   text_repetition_flags (whose oracle inlined the \S+ idiom)
    #   migrated to the explicit ASCII-whitespace-class pair
    #   (text._WS_CHARS), after which the legacy pair was DELETED and
    #   the divergence pin flipped to the agreement guard
    #   (tests/test_text_helpers.py:
    #   test_no_oracle_uses_the_dialect_divergent_whitespace_idiom).
    #   Spark-side results are bit-identical (Java \s IS the explicit
    #   class — pinned); only the DuckDB oracle texts changed —
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
    #   r13 changed-text, continued: streaming_hour_rollup's HLL
    #   certification envelope is now DERIVED from the sketch rsd
    #   (4*rsd relative + 5-user floor, ADVICE r12 item 3);
    #   streaming_neardup_store_maintenance recertifies for the oracle
    #   hoist to the shared _MAINT_ORACLE constant;
    #   streaming_neardup_store_compaction is NEW (VERDICT r12 item 3:
    #   the answer-preserving OPTIMIZE of the maintained banded store,
    #   certified against the maintenance oracle VERBATIM with
    #   fault-injected duplicate appends and a mid-stream compaction);
    #   the WAV consumers recertify for the r13 patrol hardening
    #   (fmt_len validation, odd-data_len reject) — including
    #   audio_fingerprint_neardup, whose fingerprint reader the round
    #   review routed through the shared validated header walk
    #   (_wav_header_walk) after catching its own unvalidated copy —
    "streaming_hour_rollup",
    "streaming_neardup_store_maintenance",
    "streaming_neardup_store_compaction",
    "multimodal_wav_decode",
    "multimodal_decode_dispatch",
    "audio_fingerprint_neardup",
    #   similarity_pq_topk is NEW (r13): product-quantization ADC ANN
    #   with exact re-rank — the memory-scale index family completing
    #   the exact/IVF/LSH/PQ triad; per-subspace deterministic Lloyd
    #   codebooks replayed by the oracle as unrolled CTE chains —
    "similarity_pq_topk",
    # — r9-cohort tier (policy b: oldest-first, alphabetical within
    #   the equal-staleness tie; ten r9 residents — bpe_pair_counts,
    #   corpus_curation, dedup_connected_components, dedup_minhash_lsh,
    #   dedup_ngram_jaccard, doc_self_repetition, sequence_pack_scaled,
    #   sequence_pack_stats, text_repetition_flags,
    #   truncation_loss_curve — already sit in the changed tier above,
    #   so the tranche-2 migration doubles as r9 drain) —
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
    # — r14 window plan (pinned now so the rotation stays mechanical,
    #   VERDICT r12 item 2): FIRST the twelve r9 residents that slipped
    #   this window (pagerank_nation_trade, path_regex_match,
    #   rolling_correlation, scd2_dimension_update, sessionization,
    #   similarity_ivf_topk, similarity_lsh_bucketed, skyline_pareto,
    #   source_quantile_normalize, split_leakage_check,
    #   split_leakage_lsh, unigram_cross_entropy — staleness 5 entering
    #   r14, the oldest rows anywhere) plus merge_upsert_counts and
    #   mode_per_group (evicted from this window to fund the
    #   similarity_pq_topk slot and the audio_fingerprint_neardup
    #   recert),
    #   then r14 changed-text, then the
    #   43-op r10 cohort alphabetical with the remaining ~35 slots
    #   (its tail lands in r15 at staleness 5, same two-round drain as
    #   the r9 cohort).
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
