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
#: r9 window (EXACTLY 50 ids): this round's changed-text ops (24 —
#: three families: the shingle/token helper unification, the leakage/
#: cross-entropy additions with their neighbors, and every consumer of
#: the consolidated+Arrow-transport quantile engine), then the r5
#: cohort oldest-first (26 of its 32 fit after the late
#: text_repetition_flags slot; the alphabetically-last 6 slip to r10
#: and lead its window).
_RECHECK_FIRST = [
    # — changed-text tier (window policy a: changed impl/oracle text ⇒
    #   slot, no exceptions).
    #   (1) VERDICT r8 item 1 — ws_token_count / word3_shingles hoisted
    #   into text.py; every former mirror now imports the shared pair —
    "text_token_count",
    "text_quality_score",
    "doc_self_repetition",
    "corpus_curation",
    "truncation_loss_curve",
    "sequence_pack_stats",
    "sequence_pack_scaled",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    #   late-r9 token-definition fixes: the shared pair moved to \S+
    #   run-counting after the new dialect-parity edge tests caught the
    #   space-only trim guard (tab-only text → 2 phantom tokens on BOTH
    #   engines), and text_repetition_flags carried the same
    #   trim-then-split form in its word ARRAY (phantom empty-string
    #   words depressing ttr / inflating top_word_share) —
    "text_repetition_flags",
    #   (2) VERDICT r8 items 3-4 + ADVICE — split_leakage_lsh is NEW
    #   (leakage audit blocked on the engineered LSH bucket key);
    #   bigram_cross_entropy_hashed is NEW (fixed-width feature-hashed
    #   LM, the certified 100 TB twin); split_leakage_check's threshold
    #   cosine moved to the round_cmp pair; similarity_lsh_bucketed and
    #   dedup_minhash_lsh carry the localCheckpoint caveat; the exact
    #   bigram op consumes the hoisted _bigram_pairs and unigram's
    #   docstring now names the hashed twin —
    "split_leakage_lsh",
    "bigram_cross_entropy_hashed",
    "split_leakage_check",
    "similarity_lsh_bucketed",
    "dedup_minhash_lsh",
    "bigram_cross_entropy",
    "unigram_cross_entropy",
    #   (3) VERDICT r8 item 6 — the invariant-6 rank math consolidated
    #   into functions/rank_math.py (both dialects, lockstep-tested) and
    #   the selection engine's histogram/boundary transport moved to
    #   Arrow bincount partials: every engine consumer re-certifies —
    "median_fill",
    "iqr_clip",
    "quantile_profile",
    "median_fill_scaled",
    "iqr_clip_scaled",
    "group_quantiles_scaled",
    "source_quantile_normalize",
    # — r5-cohort tier (policy b: oldest-first, alphabetical within the
    #   equal-staleness tie; 26 slots remain) —
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
    # — r10 window core (planned now so rotation stays mechanical):
    #   FIRST the 6 r5-cohort ops that didn't fit this round —
    #   snapshot_diff, source_vocab_overlap, text_simhash,
    #   token_pmi_topk, weighted_sample_topk, zorder_interleave
    #   (staleness 4 by r10,
    #   the oldest anywhere) — then r10's changed-text ops, then the
    #   46-op r6 cohort oldest-first (tpch_*, the stats family,
    #   bloom/entity-resolution, c4_heuristic_filter, ...); whatever
    #   misses leads r11 with the r7 cohort behind it.
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
