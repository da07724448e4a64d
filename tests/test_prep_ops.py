"""Behavioral tests for the training-data preparation operators
(operators/prep.py) beyond their oracle parity: chunking must be
losslessly invertible, the hash split reproducible and well-proportioned,
the repetition scores equal to a plain-Python reference implementation.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import prep
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    load,
)

from conftest import SF_SMOKE


def test_chunks_reconstruct_documents(spark):
    """Stride-prefixes of consecutive chunks concatenate back to the
    exact original text — chunking loses no bytes and overlaps are
    exactly CHUNK_LEN - CHUNK_STRIDE chars."""
    docs = {r.doc_id: r.text for r in load(spark, SF_SMOKE, "documents").collect()}
    chunks = prep.chunk_documents(load(spark, SF_SMOKE, "documents")).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.start)
        rebuilt = "".join(r.chunk[: prep.CHUNK_STRIDE] for r in rows)
        assert rebuilt == docs[doc_id]
        # every non-final chunk overlaps the next by CHUNK_LEN - CHUNK_STRIDE
        for a, b in zip(rows, rows[1:]):
            assert b.start - a.start == prep.CHUNK_STRIDE
            overlap = a.chunk[prep.CHUNK_STRIDE :]
            assert b.chunk.startswith(overlap)


def test_hash_split_deterministic_and_proportioned(spark):
    a = [tuple(r) for r in prep.hash_train_test_split(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in prep.hash_train_test_split(spark, SF_SMOKE).collect()]
    assert a == b
    counts = {r[0]: r[1] for r in a}
    total = load(spark, SF_SMOKE, "customer").count()
    assert counts["train"] + counts["test"] == total  # disjoint, exhaustive
    frac = counts["train"] / total
    assert 0.72 <= frac <= 0.88, f"train fraction {frac:.3f} far from 205/256"


def test_hash_split_is_stable_per_row_not_per_run(spark):
    """The split is a function of the key alone: computing it on a
    shuffled/repartitioned frame assigns every customer identically."""
    c = load(spark, SF_SMOKE, "customer")
    split = F.when(
        F.substring(
            F.md5(F.encode(F.col("c_custkey").cast("string"), "UTF-8")), 1, 2
        )
        < prep._SPLIT_HEX,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    one = {r.c_custkey: r.s for r in c.select("c_custkey", split.alias("s")).collect()}
    two = {
        r.c_custkey: r.s
        for r in c.repartition(7, "c_name").select("c_custkey", split.alias("s")).collect()
    }
    assert one == two


def test_repetition_scores_match_python_reference(spark):
    """avg TTR / top-word share per lang must equal a plain-Python
    recomputation over the same documents (CPython is the reference
    semantics, as with the ETL's cleaning expressions)."""
    rows = load(spark, SF_SMOKE, "documents").collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        words = r.text.strip().split()
        if not words:
            continue
        c = Counter(words)
        per_lang.setdefault(r.lang, []).append(
            (len(c) / len(words), max(c.values()) / len(words))
        )
    got = {r.lang: r for r in prep.text_repetition_flags(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_lang)
    # the operator rounds with round_cmp (floor half-up at 4dp after a
    # 7dp noise-absorb); Python's round() is banker's rounding, which
    # differs by 1e-4 exactly when a mean lands on a 4dp half-boundary —
    # so the reference must reproduce round_cmp's formula, not round().
    def round_cmp_py(x: float, dp: int = 4) -> float:
        return math.floor(round(x, dp + 3) * 10**dp + 0.5) / 10**dp

    for lang, scores in per_lang.items():
        avg_ttr = sum(s[0] for s in scores) / len(scores)
        avg_top = sum(s[1] for s in scores) / len(scores)
        assert abs(got[lang].avg_ttr - round_cmp_py(avg_ttr)) < 1e-9, lang
        assert abs(got[lang].avg_top_share - round_cmp_py(avg_top)) < 1e-9, lang
        assert got[lang].n_flagged == sum(
            1 for s in scores if s[1] > prep._TOP_WORD_SHARE
        )


def test_pii_scrub_removes_every_digit(spark):
    """Post-scrub names must contain no digits at all, and the digit-run
    count must equal a Python regex recount."""
    import re

    c = load(spark, SF_SMOKE, "customer")
    scrubbed = c.select(
        "c_name", F.regexp_replace("c_name", r"[0-9]+", "<NUM>").alias("s")
    ).collect()
    for r in scrubbed:
        assert not re.search(r"[0-9]", r.s), r.s
        assert r.s == re.sub(r"[0-9]+", "<NUM>", r.c_name)
