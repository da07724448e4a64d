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
#: r14 window recap: the fourteen r9-stale residents + the composed
#: IVF-ADC op (new) + the residual IVFADC variant (new) + the PQ
#: shortlist retune recert + the two store-lifecycle cache-key recerts
#: + the BPE trainer (new) + 30 of the r10 cohort — 50/50 green, in
#: pinned order.
_RECHECK_FIRST = [
    # r15 window (EXACTLY 50 ids), per the plan pinned at the end of
    # the r14 rotation comment and VERDICT r14 item 1:
    # — staleness tier FIRST (policy b): the twelve r10 residents whose
    #   driver rows are the oldest anywhere (staleness 5 entering r15)
    #   — tfidf_top_terms and theil_sen_slope were evicted from the r14
    #   window to fund the BPE-trainer and residual-IVFADC slots; the
    #   other ten slipped it — alphabetical within the equal-staleness
    #   tie —
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
    # — changed-text tier (policy a):
    #   bpe_encode_corpus is NEW (r15, VERDICT r14 item 2): the
    #   trainer's consumer — apply the learned merge table to the
    #   per-source word table with the identical fold, emit per-source
    #   token statistics (chars/token compression, tokens/word
    #   fertility); the rules apply as driver-scale LITERALS, so the
    #   plan is joinless; oracle = the trainer's CTE chain (shared
    #   verbatim via _bpe_chain_sql) + an e-chain applying each rule
    #   with the same fold text —
    "bpe_encode_corpus",
    #   bpe_vocab_topk is NEW (r15, second tranche): the learned
    #   vocabulary artifact — distinct symbols after all merges with
    #   corpus-weighted occurrence counts and a merge-product flag;
    #   same joinless literal-fold shape; oracle = the shared trainer
    #   chain + one unnest/count over its final w{N} table —
    "bpe_vocab_topk",
    #   bpe_train_merges recertifies for the r15 impl change (ADVICE
    #   r14: the per-round localCheckpoint blocks were unreleasable —
    #   DataFrame.unpersist is a no-op on them, verified empirically —
    #   so rounds now persist MEMORY_AND_DISK and free the superseded
    #   round once the next materializes; exactly one round's vocab
    #   stays cached) and the oracle-chain refactor into _bpe_chain_sql
    #   (generated SQL verified byte-identical against the r14 HEAD) —
    "bpe_train_merges",
    #   perplexity_tercile_split is NEW (r15, third tranche): the
    #   CCNet-style curation action — per-source head/middle/tail
    #   tercile split on unigram-LM cross-entropy; value-based
    #   thresholds selected from a per-source HISTOGRAM of rounded
    #   scores (no per-source doc sort), broadcast back; oracle
    #   replays LM + grid + histogram + threshold selection as CTEs —
    "perplexity_tercile_split",
    #   unigram_cross_entropy recertifies for the r15 impl refactor
    #   (its per-doc scoring now flows through the shared
    #   _unigram_xent_per_doc helper the tercile op consumes; oracle
    #   SQL verified byte-identical against the r14 HEAD) —
    "unigram_cross_entropy",
    # — r11-cohort tier (policy b: oldest-first; all 34 r11 residents
    #   fit this window, alphabetical within the equal-staleness tie) —
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
    # — r16 window plan (pinned now so the rotation stays mechanical):
    #   FIRST tpch_q8 (the one r11 resident evicted to fund the
    #   perplexity-tercile and unigram-recert slots — staleness 5
    #   entering r16, the oldest row anywhere), then the full 46-op
    #   r12 cohort alphabetical (staleness 4 entering r16, starting at
    #   asof_join_attribution), then r16 changed-text with whatever
    #   slots remain, then the r13 cohort head — the same two-round
    #   cohort drain as r9/r10/r11.
]

_ordered = {n: _R[n] for n in _RECHECK_FIRST if n in _R}
for _n, _rq in list(_R.items()):
    _ordered.setdefault(_n, _rq)
_R.clear()
_R.update(_ordered)
