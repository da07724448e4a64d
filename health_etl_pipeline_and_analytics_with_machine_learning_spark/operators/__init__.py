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
#: r7 window: the three r6-changed ops the r6 window omitted + this
#: round's changed/new ops (shingle cap, decode dispatch, ValueError
#: parsers), then the ENTIRE r1 and r3 cohorts (certified before the r6
#: TZ/loader hardening — the exact class of change that made four ops
#: driver-red in r5), then the r4-era flagship
#: query. After r7 lands green, max driver-row staleness across the
#: registry is 3 rounds (the remaining r4 cohort), r8's natural window.
_RECHECK_FIRST = [
    # — changed-text tier: fresh driver rows REQUIRED (window policy a).
    #   frame_sample's full oracle (r6 commit 93bf94c) has never seen
    #   the driver; decode_dispatch is this round's new seam-closure op;
    #   the two dedup ops gained the hot-shingle DF cap (both oracles
    #   changed); the two streaming ops changed behavior in r6
    #   (_wall_ts/_fmt_wall session-offset pins) but were rotated out of
    #   the r6 window (ADVICE r6 item 1); the three byte-level decodes
    #   switched from assert to ValueError validation this round —
    "multimodal_frame_sample",
    "multimodal_decode_dispatch",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "streaming_hour_rollup",
    "streaming_cdc_compaction",
    #   the other four replays changed too this round (state-store
    #   partition split REPLAY_STATE_PARTITIONS/REPLAY_PANDAS_...) —
    #   policy (a) admits no conf-only exception —
    "streaming_view_purchase_join",
    "streaming_dedup_replay",
    "streaming_countmin_replay",
    "streaming_sessionization",
    "multimodal_ppm_decode",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    #   median_fill and iqr_clip switched their quantile scalars to the
    #   r7 distributed-selection engine (functions/quantiles.py v2) —
    "median_fill",
    "iqr_clip",
    # — r1-cohort tier (oldest-first, policy b): latest driver rows date
    #   to round 1, BEFORE the r6 TZ-invariant loader + oracle typing
    #   hardening; all green in the local differential every session —
    "anti_join_inactive_customers",
    "basket_concentration_hhi",
    "brand_revenue_share",
    "contamination_ngram_check",
    "corpus_curation",
    "cube_status_priority",
    "dedup_common_spans",
    "dedup_exact_text",
    "dedup_incremental",
    "mixture_resample",
    "percent_rank_band",
    "range_band_join",
    "regr_linear_fit",
    "rfm_segments",
    "rollup_status_priority",
    "source_mixture_weights",
    "unigram_cross_entropy",
    "window_moving_avg",
    # — r3-cohort tier (next-oldest): —
    "approx_distinct_bound",
    "approx_quantile_bound",
    "doc_chunk_explode",
    "doc_fingerprint",
    "embedding_int8_quantize",
    "embedding_neardup_topk",
    "group_sum2_unpivot",
    "hash_train_test_split",
    "multimodal_meta",
    "pii_scrub_digits",
    "shard_assignment_balance",
    "similarity_bruteforce_topk",
    "text_lang_id",
    "text_quality_score",
    "text_repetition_flags",
    "text_token_count",
    # — r4-flagship tier: the SURVEY §2.4 parity core rotates back in
    #   with the remaining slots (oldest r4 certifications) —
    "filter_group_avg_topk",
    "group2_sort_mixed_limit",
    "group_avg_having_sort",
    "filter_group2_avg2_count_sort",
    "group_avg_sum2_topk",
    # r5/r6-green residents rotated out this round (unchanged text,
    # local differential still covers them every test session); the
    # remaining r4 cohort (37 ops, staleness 3) is r8's natural window.
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
