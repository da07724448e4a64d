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
#: r15 window recap: the twelve staleness-5 r10 residents + the
#: changed-text tier (bpe_encode_corpus / bpe_vocab_topk NEW, the
#: trainer persist-fix recert, perplexity_tercile_split NEW, the
#: unigram refactor recert) + 33 of the 34 r11 residents (tpch_q8
#: evicted to fund the two extra changed slots — the comment that
#: said "all 34" was wrong, ADVICE r15 item 1) — 50/50 green, in
#: pinned order.
_RECHECK_FIRST = [
    # r16 window (EXACTLY 50 ids). The plan pinned at round-14/15 end
    # said "tpch_q8, then the full 46-op r12 cohort, then r16
    # changed-text with the remaining slots" — but policy (a) is
    # absolute (every op whose impl/oracle text changed THIS round
    # gets a slot, VERDICT r15 item 2: "new ops take priority per
    # policy a"), and r16 ships NINE changed ops, so the changed tier
    # sits ahead of the cohort exactly as it did in r14/r15 and the
    # cohort's alphabetical tail (6 ops from text_quality_score on)
    # slips to r17.
    # — staleness tier FIRST (policy b): the one r11 resident, the
    #   oldest driver row anywhere (staleness 5 entering r16) —
    "tpch_q8",
    # — changed-text tier (policy a): the eight classic TPC-H shapes
    #   the suite lacked (VERDICT r15 item 2 — tpch.py now covers all
    #   22). Each decorrelates its subquery explicitly: Q2 correlated
    #   scalar-MIN -> per-part min joined back; Q4 EXISTS -> left
    #   semi; Q9 LIKE profit rollup; Q11 HAVING-vs-global-share with
    #   grid-rounded threshold compare; Q12 CASE pivot counts; Q16
    #   NOT IN -> broadcast left anti on a non-null key; Q20 nested
    #   IN chain -> semi-join ladder with the correlated threshold as
    #   a conditional sum in the same pass; Q21 multi-EXISTS/NOT-
    #   EXISTS -> co-partitioned left semi + left anti self-joins
    #   with the suppkey inequality as residual —
    "tpch_q2",
    "tpch_q4",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q16",
    "tpch_q20",
    "tpch_q21",
    #   perplexity_tercile_split recertifies for the r16 impl change
    #   (ADVICE r15 item 3: the histogram's localCheckpoint blocks
    #   were unreleasable for the session — the same class the BPE
    #   trainer was migrated off in r15 — so it now lives in a
    #   single-slot (session, sf_dir)-keyed persist cache: same-key
    #   repeats REUSE the shared cache-manager entry, different-key
    #   calls evict and release — exactly one histogram cached at any
    #   time) —
    "perplexity_tercile_split",
    #   minhash_jaccard_calibration is NEW (r16, second tranche): the
    #   estimator-calibration measurement a dedup pipeline runs when
    #   tuning (bands, rows) — matching-signature-slot count vs EXACT
    #   token-set Jaccard per banded candidate pair, rolled up per
    #   slot count; shares the banded-candidate machinery (Spark
    #   builders + the _minhash_chain_sql oracle chain) with the
    #   near-dup op —
    "minhash_jaccard_calibration",
    #   dedup_minhash_lsh recertifies for the r16 factoring (the
    #   signature/banding/candidate builders and the oracle CTE chain
    #   are now shared with the calibration op; generated oracle SQL
    #   verified byte-identical to the pre-factor text, the
    #   _bpe_chain_sql precedent) —
    "dedup_minhash_lsh",
    # — r12-cohort tier (policy b: oldest-first; 40 of the 46 fit,
    #   alphabetical within the equal-staleness tie) —
    "asof_join_attribution",
    "cohort_retention",
    "corr_matrix",
    "dedup_exact",
    "doc_fingerprint",
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
    "image_phash_neardup",
    "json_props_extract",
    "mad_outlier_detect",
    "multimodal_bmp_decode",
    "multimodal_ppm_decode",
    "overview_scalars",
    "pivot_event_counts",
    "project_dropna",
    "range_filter_agg",
    "running_distinct_users",
    "salted_skew_agg",
    "salted_skew_join",
    "set_intersect_except",
    "set_ops_bag_semantics",
    "simhash_near_pairs",
    "source_vocab_overlap",
    "stratified_hash_sample",
    "streaming_countmin_replay",
    "streaming_dedup_replay",
    "streaming_neardup_probe",
    "streaming_sessionization",
    # — r17 window plan (pinned now so the rotation stays mechanical):
    #   FIRST the eight r12 residents that slipped this window
    #   (staleness 5 entering r17, alphabetical:
    #   streaming_view_purchase_join, text_lang_id,
    #   text_quality_score, text_simhash, text_token_count,
    #   video_frame_sample, vocab_oov_rate, window_moving_avg — the
    #   last two funded the calibration-op and minhash-recert slots),
    #   then r17 changed-text, then the 47-op r13 cohort alphabetical
    #   with the remaining ~slots — the same two-round cohort drain as
    #   r11/r12.
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
