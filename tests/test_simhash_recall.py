"""Recall of the banded simhash candidate join vs exhaustive pairs.

simhash_near_pairs prunes the pair space with 5×12-bit band equi-joins;
the only acceptable loss is pairs whose differing bits touch EVERY
band. Pigeonhole: hamming ≤ 4 pairs are *guaranteed* candidates. This
test computes the exhaustive (all-pairs) truth at sf0.01 — fine at test
scale, the very thing the banding avoids in production — and checks:

- recall is 100% for hamming ≤ _SIMHASH_BANDS - 1 = 4 (the guarantee),
- recall stays high just past the guarantee (≥0.95 at hamming 5,
  ≥0.80 at hamming 6 — measured 0.965 / 0.855 on this fixture).

Overall recall at the full radius (12) is deliberately NOT asserted:
in this synthetic corpus ~40% of ALL doc pairs land within hamming 12
(documents share a template vocabulary, so fingerprints cluster), i.e.
radius 12 here is background, not near-duplication — any banding
scheme's recall over that blob measures the fixture, not the operator.
The round-1 single-prefix-band version failed the guarantee itself:
a hamming-1 pair differing inside the prefix was invisible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import dedup
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
    text_simhash,
)

from conftest import SF_CORRECT


def _exhaustive_pairs(spark):
    sig = text_simhash(spark, SF_CORRECT)
    a, b = sig.alias("a"), sig.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= dedup._SIMHASH_RADIUS)
    )


def test_banded_candidates_have_guaranteed_and_high_recall(spark):
    truth = {(r.doc_a, r.doc_b): r.hamming for r in _exhaustive_pairs(spark).collect()}
    assert truth, "fixture produced no near pairs at all — test is vacuous"

    # the query LIMITs to 50 for report shape; recall is judged on the
    # unlimited candidate set, so rebuild it via the same banding.
    sig = text_simhash(spark, SF_CORRECT)
    bands = dedup._simhash_bands(sig)
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    got = {
        (r.doc_a, r.doc_b)
        for r in (
            a.join(
                b,
                (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                hamming.cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= dedup._SIMHASH_RADIUS)
            .distinct()
            .collect()
        )
    }

    guaranteed = {k for k, h in truth.items() if h <= dedup._SIMHASH_BANDS - 1}
    assert guaranteed, "no pairs inside the guarantee radius — test is vacuous"
    missed_guaranteed = guaranteed - got
    assert not missed_guaranteed, f"pigeonhole violated: {sorted(missed_guaranteed)[:5]}"

    def recall_at(h_max: int) -> float:
        t = {k for k, h in truth.items() if h <= h_max}
        return len(got & t) / len(t)

    assert recall_at(5) >= 0.95, f"recall@5 {recall_at(5):.3f}"
    assert recall_at(6) >= 0.80, f"recall@6 {recall_at(6):.3f}"
