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
    # — r11 corpus extension (VERDICT r10 item 5: the handcrafted edge
    #   corpus is the only defense against bugs both engines share) —
    "line one\r\nline two",  # 17: CRLF — \r and \n are \s in BOTH dialects
    "a\fb form\ffeed",  # 18: form feed \x0C is \s in BOTH Java and RE2
    "a.b c*d (e) [f] {g} x|y",  # 19: regex metachars are DATA to both
    "don't café über naïve",  # 20: apostrophe + non-ASCII letters split
    #     alpha runs identically (ASCII [a-z] class on both engines)
    "a\x08b",  # 21: backspace — not whitespace in either dialect
    "a\x1bb",  # 22: escape — not whitespace in either dialect
    "a\x7fb",  # 23: DEL — not whitespace in either dialect
    "​zero​width",  # 24: ZWSP is not \s to Java OR RE2
    "﻿bom prefix",  # 25: BOM/ZWNBSP likewise data on both
    "a" * 300 + " tail",  # 26: long single token, no length cliffs
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


# --------------------------------------------------------------------------
# r10 edge audit (VERDICT r9 item 7): exotic-whitespace dialect probes.
# Java (Spark) \s is the ASCII set [ \t\n\x0B\f\r]; RE2 (DuckDB) \s is
# [ \t\n\f\r] — NO \x0B; Python re \s adds \x1C-\x1F and all Unicode
# spaces. Three regimes, probed explicitly below.

#: characters where BOTH engines agree the char is NOT whitespace
#: (intentional shared decision: whitespace is the ASCII class, not
#: Python's Unicode-aware \s — a NBSP-joined pair is ONE token in this
#: engine, documented like the cleaning quirks Q1-Q11)
NON_SEPARATORS_BOTH = ["\x1c", "\x1d", "\x1e", "\x1f", "\xa0", " ", " ", "　"]


def test_non_ascii_whitespace_is_not_a_separator_in_either_dialect(spark):
    """Both dialects treat Unicode spaces and the ASCII separator block
    as ordinary characters: 'a<CH>b' is ONE \\S+ run on BOTH engines
    (Python's re would say two for all of them — the dialects diverge
    from Python TOGETHER, which is the consistent-and-intended case)."""
    con = duckdb.connect()
    texts = [f"a{ch}b" for ch in NON_SEPARATORS_BOTH]
    got = [
        r["n"]
        for r in spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select(ws_token_count().cast("long").alias("n"))
        .collect()
    ]
    want = [
        con.execute(
            f"SELECT CAST({WS_TOKEN_COUNT_SQL} AS BIGINT) FROM (SELECT ? AS text)",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == [1] * len(texts), got
    assert want == [1] * len(texts), want


def test_vertical_tab_is_the_known_dialect_divergence(spark):
    """KNOWN, DOCUMENTED divergence of the LEGACY pair — \\x0B (vertical
    tab) is whitespace to Java's \\s but NOT to RE2's: 'a\\x0Bb' is 2
    tokens in Spark, 1 in the DuckDB oracle dialect. Unreachable
    through the driver corpus
    (test_corpus_contains_no_divergent_whitespace proves the generated
    documents carry none of these characters), so every certified row
    is unaffected. BURN-DOWN STATUS (r12): the fix — the explicit
    ASCII-whitespace-class pair (_norm_ascii/_NORM_ASCII_SQL,
    ascii_token_count/ASCII_TOKEN_COUNT_SQL, Java semantics on both
    engines) — SHIPPED as tranche 1 this round: simhash_sig +
    _SIMHASH_SIG_SQL_CTES (and their four oracle riders),
    doc_fingerprint, text_token_count, text_quality_score,
    vocab_oov_rate are migrated and agreement-pinned
    (test_ascii_pair_dialects_agree_on_vertical_tab); source_vocab_overlap
    joined the tranche in the round's review pass. This pin now guards
    the 15 LEGACY consumers (+ text_repetition_flags's inline \S+) named
    in the r13 plan
    (operators/__init__.py rotation comment); when tranche 2 migrates
    them and deletes the legacy pair, DELETE THIS TEST with it — the
    agreement pins remain."""
    con = duckdb.connect()
    (spark_n,) = [
        r["n"]
        for r in spark.createDataFrame([(0, "a\x0bb")], "doc_id long, text string")
        .select(ws_token_count().cast("long").alias("n"))
        .collect()
    ]
    duck_n = con.execute(
        f"SELECT CAST({WS_TOKEN_COUNT_SQL} AS BIGINT) FROM (SELECT ? AS text)",
        ["a\x0bb"],
    ).fetchone()[0]
    con.close()
    assert spark_n == 2  # Java \s contains \x0B
    assert duck_n == 1  # RE2 \s does not

    # r11: two more manifestations of the SAME \x0B class, pinned so
    # the eventual fix's blast radius is fully mapped. (a) vtab-only
    # text: Spark's norm collapses it to '' (0 tokens), DuckDB keeps
    # the raw byte (1 token). (b) 'a\x0C\x0Bb': the COUNTS agree (2 on
    # both — \x0C is shared whitespace) but the token CONTENT differs
    # (Spark: 'b'; DuckDB: '\x0Bb'), so fingerprint/shingle ops would
    # diverge even where token counts mask it.
    con = duckdb.connect()
    for text, want_spark_n, want_duck_n in (("\x0b", 0, 1), ("a\x0c\x0bb", 2, 2)):
        (s_n,) = [
            r["n"]
            for r in spark.createDataFrame([(0, text)], "doc_id long, text string")
            .select(ws_token_count().cast("long").alias("n"))
            .collect()
        ]
        d_n = con.execute(
            f"SELECT CAST({WS_TOKEN_COUNT_SQL} AS BIGINT) FROM (SELECT ? AS text)",
            [text],
        ).fetchone()[0]
        assert s_n == want_spark_n, (text, s_n)
        assert d_n == want_duck_n, (text, d_n)
    s_norm = (
        spark.createDataFrame([(0, "a\x0c\x0bb")], "doc_id long, text string")
        .select(_norm(F.col("text")).alias("n"))
        .collect()[0]["n"]
    )
    d_norm = con.execute(
        f"SELECT {_NORM_SQL} FROM (SELECT ? AS text)", ["a\x0c\x0bb"]
    ).fetchone()[0]
    con.close()
    assert s_norm == "a b"
    assert d_norm == "a \x0bb"


def test_corpus_contains_no_divergent_whitespace():
    """The deferral guard: the driver-generated documents tables must
    contain NONE of the characters the dialects disagree on (\\x0B) or
    agree-but-diverge-from-Python on (\\x1C-\\x1F, Unicode spaces). If
    the driver ever regenerates the corpus with such characters, this
    fails BEFORE a driver-row mismatch can."""
    import os

    con = duckdb.connect()
    pat = "[\x0b\x1c-\x1f\xa0  -     　]"
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        (n,) = con.execute(
            "SELECT COUNT(*) FROM read_parquet(?) WHERE regexp_matches(text, ?)",
            [p, pat],
        ).fetchone()
        assert n == 0, f"{sf}: {n} documents carry dialect-divergent whitespace"
    con.close()


def test_norm_dialects_agree_on_edges(spark):
    """The shared normalizer pair (_norm / _NORM_SQL) — the tokenizer
    under text_simhash, the dedup shingle index, doc_fingerprint and
    split_leakage_ngram — must produce the IDENTICAL normalized string
    on both engines for every edge text (whitespace-only, exotic ASCII
    runs, agreed non-separators)."""
    con = duckdb.connect()
    texts = EDGE_TEXTS + [f"a{ch}b" for ch in NON_SEPARATORS_BOTH]
    got = [
        r["norm"]
        for r in spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select(_norm(F.col("text")).alias("norm"))
        .collect()
    ]
    want = [
        con.execute(
            f"SELECT {_NORM_SQL} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    con.close()
    assert got == want


# --------------------------------------------------------------------------
# r12 \x0B burn-down tranche 1: the explicit ASCII-whitespace-class pair
# (text._norm_ascii/_NORM_ASCII_SQL, ascii_token_count/
# ASCII_TOKEN_COUNT_SQL) must agree across dialects on EVERYTHING —
# including the \x0B inputs the legacy pair diverges on — and must be
# bit-identical to the legacy pair on the Spark side (Java \s IS the
# explicit class, so migrating an op changes no Spark result).

DIVERGENT_TEXTS = [
    "a\x0bb",
    "\x0b",
    "a\x0c\x0bb",
    "\x0b\x0b  \x0bx\x0b",
    "one\x0btwo three",
]


def test_norm_ascii_equals_legacy_norm_on_spark(spark):
    """Spark-side no-op proof for the tranche-1 migration: Java's \\s
    is exactly [ \\t\\n\\x0B\\f\\r], so _norm_ascii ≡ _norm and
    ascii_token_count ≡ ws_token_count on every input, divergent
    characters included."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        _norm_ascii,
        ascii_token_count,
    )

    texts = EDGE_TEXTS + DIVERGENT_TEXTS + [f"a{ch}b" for ch in NON_SEPARATORS_BOTH]
    rows = (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select(
            _norm(F.col("text")).alias("legacy_norm"),
            _norm_ascii(F.col("text")).alias("ascii_norm"),
            ws_token_count().cast("long").alias("legacy_n"),
            ascii_token_count().cast("long").alias("ascii_n"),
        )
        .collect()
    )
    for r, t in zip(rows, texts):
        assert r["legacy_norm"] == r["ascii_norm"], t
        assert r["legacy_n"] == r["ascii_n"], t


def test_ascii_pair_dialects_agree_on_vertical_tab(spark):
    """THE agreement pin the burn-down earns: on every input the legacy
    pair diverges on (vertical tab in all three r10/r11-mapped
    manifestations: count, vanishing text, token content), the explicit
    ASCII-class pair produces IDENTICAL results on both engines — 
    normalized string AND token count. When tranche 2 deletes the
    legacy pair (r13), test_vertical_tab_is_the_known_dialect_divergence
    is deleted with it and this pin remains."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        _NORM_ASCII_SQL,
        ASCII_TOKEN_COUNT_SQL,
        _norm_ascii,
        ascii_token_count,
    )

    con = duckdb.connect()
    texts = EDGE_TEXTS + DIVERGENT_TEXTS + [f"a{ch}b" for ch in NON_SEPARATORS_BOTH]
    got = (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select(
            _norm_ascii(F.col("text")).alias("norm"),
            ascii_token_count().cast("long").alias("n"),
        )
        .collect()
    )
    for r, t in zip(got, texts):
        d_norm, d_n = con.execute(
            f"SELECT {_NORM_ASCII_SQL}, CAST({ASCII_TOKEN_COUNT_SQL} AS BIGINT)"
            " FROM (SELECT ? AS text)",
            [t],
        ).fetchone()
        assert r["norm"] == d_norm, (t, r["norm"], d_norm)
        assert r["n"] == d_n, (t, r["n"], d_n)
    # the specific r10/r11 manifestations, now AGREEING:
    # (a) 'a\x0Bb' is 2 tokens on BOTH engines
    (n_spark,) = [r["n"] for r, t in zip(got, texts) if t == "a\x0bb"]
    assert n_spark == 2
    # (b) vtab-only text normalizes to '' (0 tokens) on BOTH
    (n_only,) = [r["n"] for r, t in zip(got, texts) if t == "\x0b"]
    assert n_only == 0
    # (c) 'a\x0C\x0Bb' token CONTENT agrees: norm is 'a b' on BOTH
    (norm_c,) = [r["norm"] for r, t in zip(got, texts) if t == "a\x0c\x0bb"]
    assert norm_c == "a b"
    con.close()


def test_wordish_and_punct_class_dialects_agree_on_vertical_tab(spark):
    """The second idiom the class fix covers (r12): text_token_count's
    wordish tokenizer and text_quality_score's punct counter spell
    whitespace as the explicit class inside [^\\w...] — \\x0B must be
    counted as WHITESPACE (not punct) identically on both engines."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        _PUNCT_CLASS,
        _WORDISH,
    )

    con = duckdb.connect()
    texts = DIVERGENT_TEXTS + ["a!b", "!\x0b!", "..."]
    got = (
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        .select(
            F.regexp_count(F.col("text"), F.lit(_WORDISH)).cast("long").alias("w"),
            F.regexp_count(F.col("text"), F.lit(_PUNCT_CLASS)).cast("long").alias("p"),
        )
        .collect()
    )
    for r, t in zip(got, texts):
        w, p = con.execute(
            f"SELECT CAST(len(regexp_extract_all(text, '{_WORDISH}')) AS BIGINT),"
            f" CAST(len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS BIGINT)"
            " FROM (SELECT ? AS text)",
            [t],
        ).fetchone()
        assert r["w"] == w, (t, r["w"], w)
        assert r["p"] == p, (t, r["p"], p)
    # \x0B is whitespace, not punct, on both: '!\x0B!' has 2 punct
    (p_vt,) = [r["p"] for r, t in zip(got, texts) if t == "!\x0b!"]
    assert p_vt == 2


def test_legacy_pair_consumers_match_the_pinned_tranche2_plan():
    """Burn-down drift guard (r12): the set of registry oracles still
    interpolating the LEGACY \\s-based pair must equal EXACTLY the 15
    ops pinned for tranche 2 in the r13 rotation plan, and the only
    oracle inlining a raw \\S+ must be text_repetition_flags (this
    guard's first run corrected the plan: the inline site had been
    misattributed to doc_chunk_explode, which uses no \\s idiom at
    all). New code must
    adopt the explicit ASCII-class pair (this test fails if a fresh op
    reaches for the legacy one), and migrating an op off the legacy
    pair without updating the pinned plan fails it too — the r13
    planner inherits a list that is correct by construction."""
    import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators  # noqa: F401
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
        REGISTRY,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.text import (
        _NORM_SQL,
    )

    TRANCHE2 = {
        "bpe_pair_counts",
        "c4_heuristic_filter",
        "contamination_ngram_check",
        "corpus_curation",
        "dedup_common_spans",
        "dedup_connected_components",
        "dedup_exact_text",
        "dedup_incremental",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "doc_self_repetition",
        "sequence_pack_scaled",
        "sequence_pack_stats",
        "split_leakage_ngram",
        "truncation_loss_curve",
    }
    legacy_norm = {
        n for n, q in REGISTRY.items() if q.oracle and _NORM_SQL in q.oracle
    }
    legacy_count = {
        n for n, q in REGISTRY.items() if q.oracle and WS_TOKEN_COUNT_SQL in q.oracle
    }
    inline_ws = {
        n
        for n, q in REGISTRY.items()
        if q.oracle
        and "\\S+" in q.oracle
        and WS_TOKEN_COUNT_SQL not in q.oracle
        and _NORM_SQL not in q.oracle
    }
    assert legacy_norm | legacy_count == TRANCHE2, (
        sorted((legacy_norm | legacy_count) ^ TRANCHE2)
    )
    assert inline_ws == {"text_repetition_flags"}, sorted(inline_ws)
