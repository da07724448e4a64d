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
#: r10 window recap: 6 r5-stale head + 8 changed-text (four new ops,
#: the rank_spec and banded-tail helper recerts, three quantile
#: consumers) + 36 of the 45-op r6 cohort; the alphabetically-last 9
#: r6 ops (all TPC-H) slipped to r11 and lead below.
_RECHECK_FIRST = [
    # r11 window (EXACTLY 50 ids), per the plan pinned at the end of
    # the r10 rotation comment and VERDICT r10 item 1:
    # — staleness tier FIRST (policy b): the nine r6-cohort TPC-H ops
    #   that slipped the r10 window — the oldest driver rows anywhere
    #   (staleness 5) —
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    # — changed-text tier (policy a: changed impl/oracle text ⇒ slot,
    #   no exceptions):
    #   streaming_neardup_probe is NEW (VERDICT r10 item 4 — the
    #   incremental/streaming near-dup: ingest sources replayed as
    #   micro-batches, each probed against the historical banded
    #   signature store via _banded_hamming_pairs probe mode) —
    "streaming_neardup_probe",
    #   text_simhash re-certifies because its pipeline was extracted to
    #   text.simhash_sig (shared with the streaming probe) and its
    #   oracle now interpolates the shared _SIMHASH_SIG_SQL_CTES;
    #   simhash_near_pairs because _banded_hamming_pairs grew the probe
    #   parameter (self-join path plan-identical, pinned) and its
    #   oracle rides the same shared CTE block —
    "text_simhash",
    "simhash_near_pairs",
    #   the three container near-dup/sample ops re-certify because
    #   _hashed_src gained the Spark Connect parallelism guard (ADVICE
    #   r10) and _wav_encode's PCM body moved to the C-speed slice
    #   idiom (VERDICT r10 item 2, audio + wav consumers), and the Y4M
    #   header walk was hoisted into the shared _y4m_header —
    "image_phash_neardup",
    "audio_fingerprint_neardup",
    "video_frame_sample",
    #   split_leakage_ngram re-certifies for a docstring correction
    #   (ADVICE r10: leaked_share DOES carry the accepted ROUND
    #   exposure) — no code change, but changed text is changed text —
    "split_leakage_ngram",
    #   multimodal_decode_dispatch + multimodal_wav_decode are r7
    #   cohort members whose text ALSO changed (Y4M magic + stratum;
    #   C-speed encoder) — listed in this tier per policy a —
    "multimodal_decode_dispatch",
    "multimodal_wav_decode",
    # — r7-cohort tier (policy b: oldest-first, alphabetical within
    #   the equal-staleness tie; 32 of the remaining 39 fit after the
    #   changed tier took nine slots) —
    "anti_join_inactive_customers",
    "approx_distinct_bound",
    "approx_quantile_bound",
    "basket_concentration_hhi",
    "brand_revenue_share",
    "contamination_ngram_check",
    "cube_status_priority",
    "dedup_common_spans",
    "dedup_exact_text",
    "dedup_incremental",
    "doc_chunk_explode",
    "doc_fingerprint",
    "embedding_int8_quantize",
    "embedding_neardup_topk",
    "filter_group_avg_topk",
    "group_sum2_unpivot",
    "hash_train_test_split",
    "mixture_resample",
    "multimodal_bmp_decode",
    "multimodal_frame_sample",
    "multimodal_meta",
    "multimodal_ppm_decode",
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
    # — r12 window core (planned now so rotation stays mechanical):
    #   FIRST the r7-cohort remainder that did not fit
    #   (streaming_countmin_replay, streaming_dedup_replay,
    #   streaming_hour_rollup, streaming_sessionization,
    #   streaming_view_purchase_join, text_lang_id, window_moving_avg
    #   — seven ops), then r12 changed-text ops, then the 36-op r8
    #   cohort (7 + 36 = 43: r12 has 7 slots of slack before an r8
    #   resident is evicted to r13).
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
