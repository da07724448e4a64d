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
#: slot — no exceptions (the r6 window broke this rule for the two
#: streaming ops and the frame sampler, flagged by ADVICE r6); (b) the
#: remaining slots go to OLDEST-DRIVER-CERTIFICATION-FIRST, so no op's
#: latest driver row can age past ~3 rounds as the rotation cycles.
#: r11 window recap: 9 r6-stale TPC-H head + 9 changed-text (the new
#: streaming probe, the simhash_sig/_SIMHASH_SIG_SQL_CTES extraction
#: recerts, the _hashed_src/_wav_encode/_y4m_header container recerts,
#: one docstring-only) + 32 of the 39-op r7 cohort; the
#: alphabetically-last 7 r7 ops slipped to r12 and lead below.
_RECHECK_FIRST = [
    # r12 window (EXACTLY 50 ids), per the plan pinned at the end of
    # the r11 rotation comment and VERDICT r11 item 1:
    # — staleness tier FIRST (policy b): the seven r7-cohort ops that
    #   slipped the r11 window — the oldest driver rows anywhere
    #   (staleness 5) — streaming_hour_rollup ALSO changed text this
    #   round (approx-distinct users column, VERDICT r11 item 4), so
    #   its slot satisfies both tiers at once —
    "streaming_countmin_replay",
    "streaming_dedup_replay",
    "streaming_hour_rollup",
    "streaming_sessionization",
    "streaming_view_purchase_join",
    "text_lang_id",
    "window_moving_avg",
    # — changed-text tier (policy a: changed impl/oracle text ⇒ slot,
    #   no exceptions):
    #   streaming_neardup_store_maintenance is NEW (VERDICT r11 item
    #   2: the maintained-store/self-deduplicating-ingest form of the
    #   probe); streaming_neardup_probe recertifies for the four
    #   ADVICE r11 closures (substr lockstep, temp hygiene, cache
    #   fingerprint, single-checkpoint store) and the tokenizer
    #   migration below —
    "streaming_neardup_store_maintenance",
    "streaming_neardup_probe",
    #   the \x0B dialect-class burn-down, tranche 1 of 2 (VERDICT r11
    #   item 3): these six move off the divergent _norm/_NORM_SQL +
    #   ws_token_count/WS_TOKEN_COUNT_SQL pairs onto the explicit
    #   ASCII-whitespace-class pair (operators/text.py), whose two
    #   regex dialects agree on EVERY input, vertical tab included.
    #   text_simhash + simhash_near_pairs ride the migrated
    #   _SIMHASH_SIG_SQL_CTES (as do the two streaming ops above);
    #   doc_fingerprint / text_token_count / text_quality_score /
    #   vocab_oov_rate / source_vocab_overlap migrate directly.
    #   Tranche 2 (the remaining 15 legacy consumers: bpe_pair_counts,
    #   c4_heuristic_filter, contamination_ngram_check, corpus_curation,
    #   dedup_common_spans, dedup_connected_components, dedup_exact_text,
    #   dedup_incremental, dedup_minhash_lsh, dedup_ngram_jaccard,
    #   doc_self_repetition, sequence_pack_scaled, sequence_pack_stats,
    #   split_leakage_ngram, truncation_loss_curve — plus
    #   text_repetition_flags, whose oracle INLINES the \S+ idiom
    #   instead of consuming the shared pair) is PINNED for r13, after
    #   which
    #   the legacy pair is deleted and the divergence pin in
    #   tests/test_text_helpers.py flips to an agreement pin —
    "text_simhash",
    "simhash_near_pairs",
    "doc_fingerprint",
    "text_token_count",
    "text_quality_score",
    "vocab_oov_rate",
    "source_vocab_overlap",
    #   _capped_bands grew the checkpoint= parameter (ADVICE r11 item
    #   4) — helper-signature growth recertifies consumers, the
    #   _banded_hamming_pairs precedent from r10/r11 —
    "image_phash_neardup",
    "audio_fingerprint_neardup",
    #   _y4m_header hardened (r12 fuzz patrol, VERDICT r11 item 7:
    #   negative-dimension headers were ACCEPTED instead of raising
    #   into the opaque quarantine) — its two consumers recertify —
    #   and the sibling sweep then hardened _ppm_parse (int()-leniency
    #   header numbers, unchecked maxval) and _bmp_parse (pixel offset
    #   inside the header), so their decode ops recertify too —
    "multimodal_decode_dispatch",
    "video_frame_sample",
    "multimodal_ppm_decode",
    "multimodal_bmp_decode",
    # — r8-cohort tier (policy b: oldest-first, alphabetical within
    #   the equal-staleness tie; vocab_oov_rate and source_vocab_overlap
    #   count in the changed tier above, and the SEVEN alphabetically-
    #   last residents (trend_group_avg_sort, two_level_agg,
    #   user_event_paths, value_counts_topk, window_group_median_fill,
    #   window_lag_value_delta, zscore_normalize) are evicted to r13
    #   to fund the recert slots — they lead the r13 window together
    #   with the tranche-2 migration) —
    "asof_join_attribution",
    "cohort_retention",
    "corr_matrix",
    "dedup_exact",
    "eq_filter_group_agg",
    "events_enrich_segment",
    "events_gap_fill",
    "events_hour_agg",
    "filter_group2_avg2_count_sort",
    "forward_fill_last_purchase",
    "funnel_view_click_purchase",
    "global_sort_rowid",
    "group2_sort_mixed_limit",
    "group_avg_having_sort",
    "group_avg_sum2_topk",
    "group_quantiles",
    "json_props_extract",
    "mad_outlier_detect",
    "overview_scalars",
    "pivot_event_counts",
    "project_dropna",
    "range_filter_agg",
    "running_distinct_users",
    "salted_skew_agg",
    "salted_skew_join",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "stratified_hash_sample",
    # — r13 window core (planned now so rotation stays mechanical):
    #   FIRST the seven evicted r8 residents (trend_group_avg_sort,
    #   two_level_agg, user_event_paths, value_counts_topk,
    #   window_group_median_fill, window_lag_value_delta,
    #   zscore_normalize),
    #   then the 16-op tokenizer tranche 2 (15 legacy-pair consumers +
    #   text_repetition_flags's inline \S+) named
    #   above (every one is changed-text in r13 by construction), then
    #   r13 changed-text, then the r9 cohort alphabetical with
    #   whatever slots remain (the 46-op r9 cohort will itself need
    #   two rounds — oldest-first keeps the ~3-round invariant).
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
