"""Regenerate PLANS.md: captured physical plans of representative
queries with the scale-relevant properties annotated. Run:

    python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import (  # noqa: E402
    registry,
)
import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators  # noqa: F401,E402
from health_etl_pipeline_and_analytics_with_machine_learning_spark.plans import (  # noqa: E402
    formatted_plan,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.session import (  # noqa: E402
    get_spark,
)

SF = "/root/testdata/sf0.001"  # plan shape is scale-independent

SHOWCASE = {
    "cdc_latest_compaction": (
        "Latest-row-wins compaction as ONE partial-aggregated shuffle: "
        "max(struct(ordering, payload)) combines map-side to one candidate "
        "per key per input partition — no Window sort over version history."
    ),
    "snapshot_diff": (
        "Key-diff: exactly one FullOuter SortMergeJoin (the v2 mutation is "
        "derived in the same scans) feeding a 4-row classifier aggregate."
    ),
    "incremental_agg_update": (
        "Materialized-rollup maintenance: base and delta partial aggregates "
        "merged by a second tiny aggregation; at production the base is a "
        "stored table and only delta partitions are scanned."
    ),
    "tpch_q6": (
        "The data-skipping benchmark: date range, discount band, and quantity "
        "cap ALL pushed to the parquet scan; one partial-agg'd scalar returns."
    ),
    "tpch_q5": (
        "Six-table star with the cycle-closing nation predicate: every "
        "dimension broadcast, lineitem(+orders) the only real shuffles, the "
        "nation equality riding the supplier join."
    ),
    "tpch_q8": (
        "Deepest tree in the suite — eight tables, nation twice under two "
        "roles, all dims broadcast; market share as a conditional-sum ratio "
        "in a single aggregate pass."
    ),
    "tpch_q2": (
        "Correlated scalar-MIN decorrelated (r16): both dimension filters "
        "semi-prune the single lineitem scan BEFORE the pair aggregate "
        "(broadcast LeftSemi x2), the per-part minimum is a window over the "
        "dimension-bounded pair table (no duplicated subtree), and the "
        "top-100 is TakeOrderedAndProject over a full tiebreak."
    ),
    "tpch_q20": (
        "Nested IN chain as a semi-join ladder (r16): the part list prunes "
        "the fact scan as a broadcast LeftSemi BEFORE the pair aggregate, "
        "the correlated availability threshold folds into the SAME aggregate "
        "pass as a conditional sum (one lineitem scan total), and the "
        "qualifying-supplier list broadcasts as the final LeftSemi."
    ),
    "tpch_q21": (
        "The multi-EXISTS/NOT-EXISTS decorrelation stress test (r16): EXISTS "
        "other-supplier becomes a LeftSemi and NOT-EXISTS other-late-supplier "
        "a LeftAnti, both on orderkey with the suppkey inequality as a "
        "residual join condition — co-partitioned self-joins, never a "
        "DISTINCT rewrite, never a cartesian; the ASIA dim broadcasts first."
    ),
    "filter_group_avg_topk": (
        "The flagship shape. Pushed IsNotNull filter, 2-of-16-column scan, "
        "partial→final HashAggregate, TakeOrderedAndProject top-k (no global sort)."
    ),
    "eq_filter_group_agg": (
        "Interactive equality filter: EqualTo pushed into the parquet scan "
        "(partition-pruning territory when the table is laid out by the key)."
    ),
    "window_group_median_fill": (
        "groupby().transform('median') as agg + BROADCAST join-back — the fact "
        "table is never reshuffled for the tiny median table."
    ),
    "dedup_ngram_jaccard": (
        "Near-dup via inverted shingle index: every candidate join is an "
        "equi-join (SortMergeJoin on the shingle), pair work Σ freq², never "
        "n² — and since r7 the hot-shingle DF cap (COUNT window over "
        "(lang, sh) + filter) rides the join's own shuffle keys, so a "
        "stop-phrase shingle is dropped after O(k) window work instead of "
        "costing k² join pairs."
    ),
    "similarity_bruteforce_topk": (
        "Exact ANN: the (small) query set broadcasts — "
        "BroadcastNestedLoopJoin streams the corpus once; per-query top-k via "
        "partitioned window."
    ),
    "similarity_ivf_pq_topk": (
        "Composed IVF-ADC ANN serve path: both quantizers fold into one "
        "narrow index-build expression (no join/shuffle to encode); the ADC "
        "scan is a broadcast HASH join ON THE CELL KEY, so scored rows are "
        "bounded by probed-cell membership — compare the flat PQ op's "
        "full-corpus BroadcastNestedLoopJoin stream; exact refine touches "
        "only the shortlist via two broadcast point-lookups."
    ),
    "similarity_ivf_pq_residual_topk": (
        "Residual-encoded IVFADC: identical serve shape to the composed op "
        "(hash-join-on-cell, shortlist-only refine) — the residual "
        "subtraction is a narrow zip_with against the literal centroid "
        "array, adding ZERO joins; codebooks fit on residual slices, one "
        "query residual per probed cell."
    ),
    "bpe_encode_corpus": (
        "The BPE trainer's consumer (r15): the learned merge rules apply as "
        "LITERALS folded into one codegen'd expression chain — ZERO joins "
        "(the rule table is a driver-scale artifact, like the k-means "
        "centroid literals); one corpus scan pruned to 2 of the documents "
        "columns, one hash-agg shuffle into per-source type space, then the "
        "six merge folds fuse into the final aggregate's projection."
    ),
    "two_level_agg": (
        "Avg-of-avgs re-aggregation: the second groupBy consumes the first's "
        "tiny output — partial aggregation on both levels."
    ),
    "star_join_revenue": (
        "Star join: all three dimensions broadcast (BroadcastHashJoin chain), "
        "the fact table scanned once and never reshuffled for a join; the only "
        "Exchanges serve the final aggregation and sort."
    ),
    "rollup_status_priority": (
        "ROLLUP via Expand: one scan feeds every grouping-set level in a single "
        "pass with partial aggregation."
    ),
    "topk_per_group": (
        "Per-group top-k: the rnk<=k filter plans WindowGroupLimit on BOTH "
        "sides of the shuffle — each map task pre-trims to its local top-k per "
        "group, bounding shuffle volume under rows-per-group skew."
    ),
    "asof_join_attribution": (
        "As-of join without a join: union both sides, one shuffle on user_id, "
        "last(ignorenulls) over an ordered window — linear per user, never the "
        "quadratic inequality-join plan."
    ),
    "range_band_join": (
        "Non-equi banded join: 3-row interval dimension broadcast, "
        "BroadcastNestedLoopJoin streams the fact side with zero fact shuffle; "
        "scan reads only o_totalprice."
    ),
    "doc_chunk_explode": (
        "Overlapping chunking: explode(sequence) is a Generate INSIDE the "
        "scan stage — chunks of a document never shuffle; every Exchange in "
        "the plan serves the downstream distinct-agg/sort, not the chunking."
    ),
    "cube_status_priority": (
        "CUBE via Expand: one scan feeds all four grouping sets (status × "
        "priority marginals + grand total) with GROUPING() markers and "
        "partial aggregation."
    ),
    "hash_train_test_split": (
        "Deterministic md5 train/test split: the split label is a row-local "
        "expression — no sampling job, no global sort; the same row lands in "
        "the same split at any cluster size."
    ),
    "text_repetition_flags": (
        "Gopher-style repetition flags via higher-order array functions: the "
        "per-doc top-word share computes with NO explode and NO token-level "
        "shuffle — the plan has zero Generate nodes and one aggregation "
        "exchange."
    ),
    "bloom_filter_semi_join": (
        "Hand-built bitset bloom pre-filter: an 8 KB array<bigint> broadcasts "
        "(BroadcastNestedLoopJoin of ONE row), the O(1) bit-test probe drops "
        "~97% of fact rows BEFORE the exact semi join — the shuffle-avoidance "
        "contract of Catalyst's InjectRuntimeFilter, expressed by hand."
    ),
    "salted_skew_agg": (
        "Two-phase salted aggregation: the first Exchange carries (key, salt) "
        "partials so no reduce task owns a whole hot key; the second merges "
        "|keys|·n_salt tiny rows. Oracle-equal to the plain GROUP BY."
    ),
    "tfidf_top_terms": (
        "TF-IDF: tokens stream through Generate inside codegen; tf, df and "
        "doc-length aggregate in token space (never occurrence space); df and "
        "N broadcast back; top-k via TakeOrderedAndProject, no global sort."
    ),
    "sequence_pack_scaled": (
        "Two-phase cumulative sum for concat-and-chunk packing: static "
        "quantile-boundary buckets (no per-job range re-sampling), per-bucket "
        "Window cumsum — note the Window partitions by __pid, NOT "
        "SinglePartition like the parity twin — and a broadcast join carries "
        "the prefix offsets back. No task ever sees more than one id range."
    ),
    "vocab_oov_rate": (
        "Vocabulary coverage: one hash-agg shuffle builds token counts with "
        "map-side partials, TakeOrderedAndProject cuts the top-V (V rows to "
        "the driver, no global sort), and the membership join broadcasts the "
        "vocab — the exploded token stream is never shuffled for the join."
    ),
    "kmv_distinct_sketch": (
        "Mergeable cardinality sketch: distinct-hash shuffle on (group, h), "
        "then WindowGroupLimit keeps only k hashes per group PER MAP TASK "
        "before the window shuffle — the k-set IS the inter-stage state, "
        "which is the whole point of KMV/HLL-class sketches."
    ),
    "weighted_sample_topk": (
        "Deterministic weighted sampling: priority is a row-local md5 "
        "expression and the global top-k is TakeOrderedAndProject — ZERO "
        "exchanges; each task keeps k rows and the driver merges."
    ),
    "skyline_pareto": (
        "Prune-then-verify skyline: the bucket staircase broadcasts back as "
        "a row-local filter (no fact shuffle), and only the staircase-width "
        "candidate set enters the quadratic dominance check as a "
        "BroadcastNestedLoopJoin anti-join against itself."
    ),
    "assoc_rules_lift": (
        "Market-basket pairs without a self-join: per-order sorted item sets "
        "from ONE basket-key shuffle, C(k,2) pair expansion IN-ROW via "
        "indexed transform+slice, one aggregate shuffle on the pair key; "
        "part dim and item counts broadcast."
    ),
}

#: plan showcases that are not a whole registry op: (blurb, builder).
#: streaming_neardup_probe's certified DataFrame is the post-replay
#: accumulator read, so the scale-relevant plan is the PER-MICRO-BATCH
#: probe join itself — built here exactly as foreachBatch builds it.
def _neardup_probe_join(spark):
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.dedup import (
        _banded_hamming_pairs,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        simhash_sig,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.neardup import (
        _store_bands,
        _store_pred,
    )

    docs = registry.load(spark, SF, "documents")
    batch = docs.filter(~_store_pred(F.col("source"))).select("doc_id", "text")
    return _banded_hamming_pairs(
        probe=simhash_sig(batch, spark), sig_bands=_store_bands(spark, SF)
    )


#: streaming_neardup_store_maintenance's per-micro-batch step against
#: the PERSISTED banded store — built here exactly as _probe_and_grow
#: builds it for the whole ingest as one batch.
def _neardup_maintenance_join(spark):
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.dedup import (
        _banded_prefix_pairs,
        _bands_with_src,
        _NEARDUP_STORE_SOURCES,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        simhash_sig,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.neardup import (
        _STORE_BANDS_SCHEMA,
        _init_store_bands_dir,
        _store_pred,
        _src_num,
    )

    store_dir = _init_store_bands_dir(spark, SF)
    docs = registry.load(spark, SF, "documents")
    batch = docs.filter(~_store_pred(F.col("source"))).select(
        "doc_id", "text", _src_num(F.col("source")).alias("src")
    )
    # mirror _maint_batch exactly: production eagerly checkpoints the
    # band rows before _banded_prefix_pairs (the helper's documented
    # contract — it references the frame twice), so the dumped plan
    # must show the probe side as an RDD scan, not the inlined simhash
    # pipeline
    batch_bands = _bands_with_src(simhash_sig(batch, spark), batch).localCheckpoint(
        eager=True
    )
    store = (
        spark.read.schema(_STORE_BANDS_SCHEMA)
        .parquet(store_dir)
        .filter(F.col("src") < _NEARDUP_STORE_SOURCES)
        .distinct()
    )
    return _banded_prefix_pairs(batch_bands, store)


#: streaming_neardup_store_compaction's distinct rewrite of the
#: persisted banded store — the OPTIMIZE every appended table needs.
def _neardup_compaction_rewrite(spark):
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.neardup import (
        _STORE_BANDS_SCHEMA,
        _init_store_bands_dir,
    )

    store_dir = _init_store_bands_dir(spark, SF)
    return spark.read.schema(_STORE_BANDS_SCHEMA).parquet(store_dir).distinct()


def _bpe_train_round(spark):
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import (
        text as T,
    )

    cur = (
        T._word_freq(spark, SF)
        .select(T._bpe_symbolize(F.col("w")).alias("s"), "wn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cur.count()
    # main() clearCache()s after the showcase loop — the persist here
    # exists only so the captured plan shows the materialized
    # InMemoryRelation a real training round reads
    return T._bpe_round_pairs(cur)


EXTRA_SHOWCASE = {
    "bpe_train_merges (one training round's pair-count statistic)": (
        (
            "What each of the trainer's greedy rounds executes over the "
            "CACHED vocab table (the trainer op itself returns the "
            "driver-scale merge table, so the scale story lives here): a "
            "narrow codegen'd adjacent-pair explode and ONE (l, r)-keyed "
            "partial-aggregated count shuffle — shuffle volume is |distinct "
            "pairs|, not |vocab|. The InMemoryRelation's embedded build plan "
            "is the ONE-TIME occurrence→type-space collapse (the only "
            "corpus-sized shuffle in the whole training run); after round 0 "
            "no round ever re-touches the corpus, and exactly one round's "
            "vocab is cached at a time (the superseded round unpersists once "
            "its successor materializes)."
        ),
        _bpe_train_round,
    ),
    "streaming_neardup_probe (per-micro-batch probe join)": (
        (
            "The incremental near-dup shape each foreachBatch micro-batch "
            "replays: the batch's signatures (Arrow-batched tally, zero "
            "shuffle) band-explode and equi-join the PRE-BANDED, hot-bucket-"
            "capped store (materialized once per stream, a persisted table "
            "in production) on (bk, band_key) — never a probe×store product "
            "— with the cap's bucket-size filter a BroadcastHashJoin. "
            "Candidate volume is linear in the batch regardless of probe "
            "skew; the Hamming verify and top-50 run per batch, and the "
            "global answer is recovered relationally after the replay."
        ),
        _neardup_probe_join,
    ),
    "streaming_neardup_store_maintenance (per-micro-batch store probe)": (
        (
            "The maintained-store step each ingest micro-batch runs (r12, "
            "whole-batch form): the store is READ PRE-BANDED from its "
            "persisted parquet form — no re-explode — filtered to sources "
            "before the batch (replay idempotence), DISTINCT-deduped "
            "(at-least-once appends), then equi-joined by the batch's band "
            "rows on (bk, band_key) with the source ordering as a post-join "
            "predicate. The per-PROBE-STATE hot-bucket population is one "
            "windowed exclusive running sum over the aggregated (bucket, "
            "src) counts — no state-expansion join — and the surviving cap "
            "table applies as a BroadcastHashJoin. Per-batch work stays "
            "linear as the store grows because the cap bounds every bucket "
            "a probe row can touch."
        ),
        _neardup_maintenance_join,
    ),
    "streaming_neardup_store_compaction (the OPTIMIZE rewrite)": (
        (
            "The maintained store's compaction step (r13): one parquet "
            "scan of the band rows, a partial/final hash-aggregate "
            "DISTINCT on all five columns (exactly the dedup the probe's "
            "read-side DISTINCT otherwise pays per batch), one exchange, "
            "write. No join of any strategy — compaction cost is linear "
            "in the store at any corpus size, and the registry op proves "
            "it answer-preserving against the maintenance oracle verbatim."
        ),
        _neardup_compaction_rewrite,
    ),
}


def main() -> None:
    spark = get_spark(app_name="dump_plans", cpus=8, shuffle_partitions=8)
    out = [
        "# PLANS — captured physical plans (generated by scripts/dump_plans.py)",
        "",
        "Representative `explain('formatted')` output at sf0.001 (plan shape is",
        "scale-independent; `tests/test_plans.py` pins these properties as",
        "regressions). Every plan below is the plan we WANT at 100 TB, not just",
        "the first one that passed.",
        "",
    ]
    for name, blurb in SHOWCASE.items():
        df = registry.REGISTRY[name].fn(spark, SF)
        out += [f"## {name}", "", blurb, "", "```", formatted_plan(df).rstrip(), "```", ""]
    for name, (blurb, builder) in EXTRA_SHOWCASE.items():
        df = builder(spark)
        out += [f"## {name}", "", blurb, "", "```", formatted_plan(df).rstrip(), "```", ""]
    spark.catalog.clearCache()  # builders may persist (r15 review)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
