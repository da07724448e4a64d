"""Dialect-parity pins for the shared text helpers hoisted in r9
(text.ws_token_count / WS_TOKEN_COUNT_SQL, text.word3_shingles /
word3_shingles_sql, text._bigram_pairs / _BIGRAM_PAIRS_SQL).

The op-level oracles exercise these pairs over the synthetic corpus;
these tests drive the two dialects of each pair over HANDCRAFTED edge
cases the corpus may never contain — empty text, whitespace-only text,
exotic whitespace runs, 1/2/3-token boundaries, repeated shingles —
and assert the Spark expression and the DuckDB twin agree exactly.
Same patrol shape as the rank_math lockstep test: one definition, two
executions, one test."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
    _BIGRAM_PAIRS_SQL,
    _NORM_SQL,
    WS_TOKEN_COUNT_SQL,
    _bigram_pairs,
    _norm,
    word3_shingles,
    word3_shingles_sql,
    ws_token_count,
)

EDGE_TEXTS = [
    "",
    " ",
    "   \t  \n ",
    "one",
    "one two",
    "one two three",
    "one two three four",
    "  padded   runs\tof\nwhitespace  ",
    "a a a a a a",  # repeated shingles
    "Mixed CASE Tokens Here",
    "punct, only! tokens?",
    "x " * 50,  # long uniform doc
    "word",
    "\ttab before",  # 13: non-space EDGE whitespace next to real content —
    "newline after\n",  # 14: the case where the old trim-split form
    "\t \n",  # 15: counted phantom tokens (and 2 for this tab-only one)
    "ab3cd ef9 42",  # 16: digits split alpha tokens, all-digit words drop
]


@pytest.fixture()
def ducked():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(EDGE_TEXTS))
    )
    yield con
    con.close()


def _spark_docs(spark):
    return spark.createDataFrame(
        list(enumerate(EDGE_TEXTS)), "doc_id long, text string"
    )


def test_ws_token_count_dialects_agree_on_edges(spark, ducked):
    got = {
        r["doc_id"]: r["n"]
        for r in _spark_docs(spark)
        .select("doc_id", ws_token_count().cast("long").alias("n"))
        .collect()
    }
    want = dict(
        ducked.execute(
            f"SELECT doc_id, CAST({WS_TOKEN_COUNT_SQL} AS BIGINT) FROM documents"
        ).fetchall()
    )
    assert got == want
    # the definition's own contract: empty/whitespace-only → 0, where a
    # bare split would report 1
    assert want[0] == 0 and want[1] == 0 and want[2] == 0
    assert want[3] == 1 and want[5] == 3
    # the r9 fix: non-space edge whitespace must neither add phantom
    # tokens next to real content nor count on whitespace-only text
    # (the old trim-split form reported 3, 3, and 2 here)
    assert want[13] == 2 and want[14] == 2 and want[15] == 0


def test_word3_shingles_dialects_agree_on_edges(spark, ducked):
    got = {
        r["doc_id"]: r["sh"]
        for r in _spark_docs(spark)
        .select(
            "doc_id", F.split(_norm(F.col("text")), " ").alias("toks")
        )
        .select("doc_id", word3_shingles(F.col("toks")).alias("sh"))
        .collect()
    }
    want = dict(
        ducked.execute(
            f"""SELECT doc_id, {word3_shingles_sql("toks")} FROM
            (SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS toks
             FROM documents)"""
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert list(got[k]) == list(want[k]), (k, EDGE_TEXTS[k], got[k], want[k])
    # under-3-token docs short-circuit to EMPTY on both engines (Spark's
    # sequence(1, 0) is a descending [1, 0], DuckDB's generate_series is
    # empty — the guards exist to reconcile exactly this)
    for k in (0, 1, 2, 3, 4, 12):
        assert got[k] == [], (k, got[k])
    assert got[5] == ["one two three"]


def test_bigram_pairs_dialects_agree_on_edges(spark, ducked):
    got = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in _bigram_pairs(_spark_docs(spark)).collect()
    )
    want = sorted(
        ducked.execute(
            f"WITH {_BIGRAM_PAIRS_SQL} SELECT doc_id, w1, w2 FROM pairs"
        ).fetchall()
    )
    assert got == want
    docs_with_pairs = {d for d, _, _ in got}
    assert 3 not in docs_with_pairs  # single token → no bigrams
    assert 4 in docs_with_pairs


def test_alpha_tokenize_dialects_agree_on_edges(spark, ducked):
    """The ALPHA_TOKENIZE pair (lowercase, split on non-[a-z] runs,
    drop empties) feeds tfidf / cross-entropy / vocab ops — pin its two
    dialects over the same edge corpus (empty text, punctuation-only,
    mixed case, digits inside words)."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        ALPHA_TOKENIZE_EXPR,
        ALPHA_TOKENIZE_SQL,
    )

    got = {
        r["doc_id"]: list(r["a"])
        for r in _spark_docs(spark)
        .select("doc_id", F.expr(ALPHA_TOKENIZE_EXPR).alias("a"))
        .collect()
    }
    want = dict(
        ducked.execute(
            f"SELECT doc_id, {ALPHA_TOKENIZE_SQL} FROM documents"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert got[k] == list(want[k]), (k, EDGE_TEXTS[k], got[k], want[k])
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[9] == ["mixed", "case", "tokens", "here"]
    assert got[10] == ["punct", "only", "tokens"]
    # digits split alpha runs and all-digit words vanish entirely
    assert got[16] == ["ab", "cd", "ef"]
