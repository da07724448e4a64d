"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (BASELINE.json north star): token
counting, quality scoring, language ID, fingerprinting, SimHash.

All per-document computation is native expressions (regexp_count /
split / md5 / higher-order array ops) — embarrassingly parallel, no
shuffle except the final small aggregations, scales linearly with the
corpus. Every query here has a DuckDB oracle; regex patterns are
written in each engine's dialect but match the same language (Java
regex vs RE2 — ASCII classes only, deliberately).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query, round_cmp, round_cmp_sql, spread

#: the SHARED lowercase-alpha tokenizer: Spark expression and its DuckDB
#: twin. bigram_cross_entropy, token_pmi_topk, and inverted_index_topk
#: all consume THIS pair so their token streams are provably identical —
#: edit here, never inline.
ALPHA_TOKENIZE_EXPR = "filter(split(lower(text), '[^a-z]+'), x -> x <> '')"
ALPHA_TOKENIZE_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"
)

# --------------------------------------------------------------------------
# The SHARED whitespace normalizer + token-count pairs — the explicit
# ASCII-whitespace-class form. History: the original pair spelled
# whitespace as each dialect's \s, but Java's (Spark) \s is
# [ \t\n\x0B\f\r] while RE2's (DuckDB) LACKS \x0B — the one divergent
# character the r10 edge audit found (corpus-guarded until fixed).
# Writing the class OUT makes both dialects parse the identical set, so
# twins built from it agree on EVERY input, vertical tab included; on
# the Spark side the explicit class is bit-identical to \s (Java
# semantics chosen: \x0B IS whitespace — pinned by
# test_ascii_class_equals_java_whitespace_on_spark). The burn-down
# shipped in two tranches (r12: simhash_sig + riders, doc_fingerprint,
# text_token_count, text_quality_score, vocab_oov_rate,
# source_vocab_overlap; r13: the 15 remaining consumers +
# text_repetition_flags's inline \S+), after which the legacy \s-based
# pair was DELETED — every whitespace tokenization in the repo now
# consumes these definitions. Edit here, never inline.
#
# Token-count definition: the number of non-whitespace runs. The r9
# hoist's original trim-guard-plus-split form miscounted edges: SQL
# ``trim`` strips SPACES only, so ANY leading/trailing tab/newline
# survived the trim and split into a phantom empty-string token —
# tab-only text counted 2, ``"\tfoo"`` counted 2 — consistently on
# both engines, so oracles stayed green while the count lied. The
# run-count form needs no guard at all: 0 for empty/whitespace-only,
# one per actual word when edge whitespace is non-space.
# --------------------------------------------------------------------------

#: the class body — ONE source string interpolated into BOTH dialects'
#: patterns (escape sequences, not raw control bytes, so each regex
#: engine parses the same text the tests can read)
_WS_CHARS = r" \t\n\x0B\f\r"


def _norm_ascii(col):
    """Collapse ASCII whitespace to single spaces, trim, lowercase —
    the ONE normalizer every fingerprint/shingle/token pipeline
    consumes. Spark-side behavior identical to ``\\s`` (pinned by
    test_ascii_class_equals_java_whitespace_on_spark); the explicit
    class keeps the DuckDB twin agreeing on ``\\x0B``."""
    return F.lower(
        F.regexp_replace(F.regexp_replace(col, f"[{_WS_CHARS}]+", " "), r"^ | $", "")
    )


_NORM_ASCII_SQL = (
    f"lower(regexp_replace(regexp_replace(text, '[{_WS_CHARS}]+', ' ', 'g'),"
    " '^ | $', '', 'g'))"
)

ASCII_TOKEN_COUNT_SQL = f"len(regexp_extract_all(text, '[^{_WS_CHARS}]+'))"


def ascii_token_count():
    """Spark twin of :data:`ASCII_TOKEN_COUNT_SQL`: the number of
    non-ASCII-whitespace runs of the ``text`` column (0 for empty or
    whitespace-only text). Row-local, codegen'd."""
    return F.regexp_count(F.col("text"), F.lit(f"[^{_WS_CHARS}]+"))


def word3_shingles(toks):
    """Word-3-gram shingle ARRAY over a token-array column — the ONE
    Spark-side shingle definition (hoisted r9; previously mirrored by
    ``dedup._shingle_index`` and ``doc_self_repetition``, VERDICT r8
    item 1). :func:`word3_shingles_sql` is its DuckDB twin.

    ``toks`` MUST be a pre-projected column reference, never the raw
    ``split(normalize(text))`` expression: each ``element_at`` inside
    the lambda re-evaluates its child PER ELEMENT, so an inlined split
    re-runs the regex pipeline ~3·(n−2) times per row (measured 19 s →
    0.9 s at sf0.1 in the dedup index; 13 s → 0.06 s in
    doc_self_repetition). The ``F.sequence`` guard is load-bearing:
    ``sequence(1, 0)`` is a DESCENDING ``[1, 0]``, not empty, so docs
    under 3 tokens must short-circuit to an empty start list before any
    ``element_at`` can see an out-of-range index."""
    n = F.size(toks)
    starts = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        starts,
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )


def word3_shingles_sql(toks: str) -> str:
    """DuckDB twin of :func:`word3_shingles` over a token-list column
    named ``toks``. ``generate_series(1, 0)`` is EMPTY in DuckDB (unlike
    Spark's descending sequence), so the ``greatest`` guard alone covers
    the under-3-token case — verified: len 2 → [] → 0 shingles."""
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - 2, 0)), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])"
    )

# token pattern: word runs or single non-word-non-space chars (BPE-ish
# pre-tokenization shape) — whitespace spelled out as the explicit
# class (r12 tranche 1: \s inside [^\w\s] carried the same \x0B
# divergence as the normalizer pair)
_WORDISH = rf"\w+|[^\w{_WS_CHARS}]"

#: its punct-only sibling (text_quality_score)
_PUNCT_CLASS = rf"[^\w{_WS_CHARS}]"

_STOPWORDS = r"\b(the|a|an|and|or|of|to|in|is|it|that|for)\b"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           {ASCII_TOKEN_COUNT_SQL} AS n_ws_tokens,
           len(regexp_extract_all(text, '{_WORDISH}')) AS n_wordish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_est
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens (the shared
    :func:`ascii_token_count` pair — r12 tranche 1 of the \\x0B
    burn-down), BPE-ish regex tokens, and the chars/4 heuristic
    estimate. Pure projection — no shuffle at all."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        ascii_token_count().cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(_WORDISH)).cast("long").alias("n_wordish_tokens"),
        F.ceil(F.length(t) / 4.0).cast("long").alias("n_bpe_est"),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit,
             len(regexp_extract_all(text, '{_PUNCT_CLASS}')) AS n_punct,
             {ASCII_TOKEN_COUNT_SQL} AS n_tokens,
             len(regexp_extract_all(lower(text), '\\b(the|a|an|and|or|of|to|in|is|it|that|for)\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           ROUND(n_alpha * 1.0 / n_chars, 4) AS alpha_ratio,
           ROUND(n_digit * 1.0 / n_chars, 4) AS digit_ratio,
           ROUND(n_punct * 1.0 / n_chars, 4) AS punct_ratio,
           ROUND(CASE WHEN n_tokens = 0 THEN 0 ELSE n_stop * 1.0 / n_tokens END, 4) AS stopword_ratio,
           ROUND(CASE WHEN n_tokens = 0 THEN 0 ELSE (n_chars - n_tokens + 1) * 1.0 / n_tokens END, 4) AS avg_token_len,
           CAST(n_alpha * 1.0 / n_chars > 0.55 AND n_tokens >= 5 AS INT) AS quality_flag
    FROM m
    ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring via char-class ratios + stopword density — the
    standard cheap pre-filter for LLM training corpora. One projection."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tokens = ascii_token_count()
    n_alpha = F.regexp_count(t, F.lit("[A-Za-z]"))
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    n_punct = F.regexp_count(t, F.lit(_PUNCT_CLASS))
    n_stop = F.regexp_count(F.lower(t), F.lit(_STOPWORDS))
    return d.select(
        "doc_id",
        F.round(n_alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(n_digit / n_chars, 4).alias("digit_ratio"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(n_stop / n_tokens), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_tokens == 0, F.lit(0.0)).otherwise((n_chars - n_tokens + 1) / n_tokens),
            4,
        ).alias("avg_token_len"),
        ((n_alpha / n_chars > 0.55) & (n_tokens >= 5)).cast("int").alias("quality_flag"),
    ).orderBy("doc_id")


_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|on)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|für|auf)\b",
    "fr": r"\b(le|la|les|et|est|dans|pour|une|sur|avec)\b",
    "es": r"\b(el|los|las|es|en|para|una|con|por|del)\b",
}
_CJK_SPARK = "[一-鿿]"
_CJK_DUCK = r"[\x{4e00}-\x{9fff}]"


def _langid_case_sql() -> str:
    return """
        CASE WHEN s_zh > 0 THEN 'zh'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END
    """


@query(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '{_LANG_PATTERNS["en"]}')) AS s_en,
             len(regexp_extract_all(lower(text), '{_LANG_PATTERNS["de"]}')) AS s_de,
             len(regexp_extract_all(lower(text), '{_LANG_PATTERNS["fr"]}')) AS s_fr,
             len(regexp_extract_all(lower(text), '{_LANG_PATTERNS["es"]}')) AS s_es,
             len(regexp_extract_all(text, '{_CJK_DUCK}')) AS s_zh
      FROM documents
    )
    SELECT lang, {_langid_case_sql()} AS predicted, COUNT(*) AS n
    FROM s
    GROUP BY lang, predicted
    ORDER BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/CJK-heuristic language ID, reported as a (true lang ×
    predicted) confusion table. Scores are per-row regexp counts;
    prediction is a deterministic argmax with fixed tie order."""
    d = load(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    scores = {
        f"s_{k}": F.regexp_count(lt, F.lit(p)) for k, p in _LANG_PATTERNS.items()
    }
    scores["s_zh"] = F.regexp_count(F.col("text"), F.lit(_CJK_SPARK))
    s = d.select("doc_id", "lang", *[v.alias(k) for k, v in scores.items()])
    predicted = (
        F.when(F.col("s_zh") > 0, F.lit("zh"))
        .when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            F.lit("en"),
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), F.lit("de"))
        .when(F.col("s_fr") >= F.col("s_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return (
        s.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_NORM_ASCII_SQL}) AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 of the whitespace-normalized,
    lowercased text (the explicit-class pair — r12 tranche 1 of the
    \x0B burn-down). The join key for exact near-normal dedup at scale
    (fingerprint once, groupBy fp — never compare full texts twice)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(F.encode(_norm_ascii(F.col("text")), "UTF-8")).alias("fp")
    ).orderBy("doc_id")


def simhash_sig(d: DataFrame, spark: SparkSession) -> DataFrame:
    """(doc_id, text, …) → (doc_id, simhash): the 60-bit SimHash
    pipeline over a documents-shaped DataFrame. ONE definition (r11)
    shared by ``text_simhash`` (whole corpus, presentation-sorted),
    ``dedup.simhash_near_pairs`` (via text_simhash), and the streaming
    near-dup probe's per-micro-batch signatures
    (streaming/neardup.py) — a second copy of the tally would drift on
    any retune.

    Scale shape: token hashes stay JVM-side (md5 in a narrow expression
    — the determinism contract with the oracle); the 60-way bit tally
    is pure integer math with NO data-dependent branching, so it runs
    as a vectorized Arrow-batched ``mapInArrow`` — per bit, one
    shift/mask over the batch's FLATTENED token-hash buffer plus one
    offsets-driven segment sum (r17; the r11 form reduced a
    (tokens × 60) matrix per document in a Python loop). The doc's
    token array never leaves its row: ZERO shuffle. Measured at sf0.1
    (32 cores): 0.6 s for the r11 per-doc form vs 1.33 s for
    explode(tokens)×60 rows through two doc_id-keyed partial-agg
    shuffles, 2.1 s for interpreted higher-order-lambda tallies, 3.5 s
    for 60 conditional SUMs in one wide groupBy; the flattened form
    removes the remaining per-doc Python overhead from the winner.
    """
    import numpy as np
    import pyarrow as pa

    def _tally(batches):
        # r17: whole-batch vectorization over the FLATTENED token-hash
        # buffer (mapInArrow: the list column's values + offsets are
        # contiguous Arrow buffers — zero per-document Python loop,
        # guide §4.2). Per bit k, one shift/mask over every token hash
        # in the batch and one segment-sum (np.add.reduceat at the
        # per-document offsets) replaces len(batch) small per-doc
        # matrices. bit k is set when (#tokens with bit k) ≥ half the
        # tokens: s_k = 2·c_k − n ≥ 0 ⇔ the ±1 tally rule — the SAME
        # integer math as the per-doc form, so signatures are
        # bit-identical (pinned by the oracle parity suite).
        for rb in batches:
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            lst = rb.column(1)
            flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            starts = off[:-1] - off[0]  # flatten() rebases the values to 0
            lens = np.diff(off)  # ≥ 1 per row (empty docs filtered upstream)
            sims = np.zeros(len(ids), dtype=np.uint64)
            one = np.uint64(1)
            for k in range(60):
                bit = ((flat >> np.uint64(k)) & one).astype(np.int64)
                c = np.add.reduceat(bit, starts)
                sims |= ((2 * c - lens) >= 0).astype(np.uint64) << np.uint64(k)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), type=pa.int64()),
                    pa.array(sims.astype(np.int64), type=pa.int64()),
                ],
                names=["doc_id", "simhash"],
            )

    # the testdata ships one parquet split per table, so the narrow
    # compute would land on ONE task; spread (doc_id, norm) across a
    # BOUNDED number of tasks first (8 measured best at sf0.1 — wider
    # widths pay more per-task/Arrow overhead than they recover on this
    # overhead-bound corpus). At 100 TB the source has thousands of
    # natural splits and this repartition is a no-op to remove, not a
    # plan change. sparkContext raises on Spark Connect sessions
    # (ADVICE r10) — same fixed fallback as the pipeline env probe.
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - Connect-only path
        par = 8
    return (
        spread(
            d.select("doc_id", _norm_ascii(F.col("text")).alias("norm")),
            "doc_id",
            n=min(8, par),
        )
        .select(
            "doc_id",
            F.expr(
                "transform(filter(array_distinct(split(norm, ' ')), t -> t <> ''),"
                " t -> cast(conv(substring(md5(encode(t, 'UTF-8')), 1, 15), 16, 10)"
                " as bigint))"
            ).alias("hvs"),
        )
        .filter(F.size("hvs") > 0)  # all-whitespace docs: absent on both sides
        .mapInArrow(_tally, schema="doc_id long, simhash long")
    )


#: oracle twin of :func:`simhash_sig` — the CTE block ending in
#: ``allsig(doc_id, simhash)``. ONE definition (r11) interpolated by
#: the text_simhash, dedup.simhash_near_pairs, and
#: dedup.streaming_neardup_probe oracles — the SQL-side mirror of the
#: single-definition rule the Spark side already follows.
_SIMHASH_SIG_SQL_CTES = f"""tok AS (
      SELECT DISTINCT doc_id, unnest(regexp_split_to_array({_NORM_ASCII_SQL}, ' ')) AS tok
      FROM documents
    ),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
      FROM tok WHERE tok <> ''
    ),
    bits AS (
      SELECT doc_id, k,
             SUM(CASE WHEN (hv >> k) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT unnest(generate_series(0, 59)) AS k)
      GROUP BY doc_id, k
    ),
    allsig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s >= 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits
      GROUP BY doc_id
    )"""


@query(
    "text_simhash",
    oracle=f"""
    WITH {_SIMHASH_SIG_SQL_CTES}
    SELECT doc_id, simhash FROM allsig
    ORDER BY doc_id
    """,
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash over distinct tokens (md5-derived token hashes, so
    the fingerprint is engine-independent and oracle-checkable — unlike
    murmur3 F.hash, which is Spark-internal). The pipeline itself lives
    in :func:`simhash_sig` (shared with the streaming near-dup probe
    since r11); this op adds only the corpus load and the presentation
    sort. Near-dup candidates then come from hamming-distance banding
    on the fingerprint (see dedup.simhash_near_pairs), never from
    O(n²) scans.
    """
    return simhash_sig(load(spark, sf_dir, "documents"), spark).orderBy("doc_id")


TF_TOP_K = 20


@query(
    "term_frequency_topk",
    oracle=f"""
    SELECT token,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {TF_TOP_K}
    """,
)
def term_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term frequency: tokenize every document, count
    global occurrences and document frequency, top-{TF_TOP_K} — the
    canonical explode→aggregate shape (and the df half of TF-IDF;
    text_quality_score covers the per-doc tf side).

    Scale shape: ``explode(split(...))`` is a generator inside
    whole-stage codegen — tokens never materialize as a corpus-wide
    array. The aggregation partial-combines per partition BEFORE the
    shuffle, so shuffle volume is |distinct tokens per partition|, not
    |token occurrences|; Zipf-skewed hot tokens ("the") are exactly
    what map-side combine flattens. Top-k via TakeOrderedAndProject,
    tie-broken on the token for oracle determinism.
    """
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(TF_TOP_K)
    )


TFIDF_TOP_K = 50


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, SUM(tf) AS doc_len FROM tf GROUP BY doc_id),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf)
    SELECT tf.doc_id, tf.token,
           tf.tf AS term_count,
           df.df AS doc_freq,
           ROUND((tf.tf * 1.0 / dl.doc_len)
                 * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf, dl, df, n
    WHERE tf.doc_id = dl.doc_id AND tf.token = df.token
    ORDER BY tfidf DESC, tf.doc_id, tf.token
    LIMIT {TFIDF_TOP_K}
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: the classic relevance weight, corpus-wide top-{TFIDF_TOP_K}
    (term, doc) pairs. Completes the TF-IDF pair whose halves already
    exist separately (term_frequency_topk = df side, text_quality_score
    = per-doc stats): tf normalized by doc length × smoothed idf
    ``ln((N+1)/(df+1)) + 1`` (sklearn's smooth_idf form).

    Scale shape: tokens stream through explode inside codegen (never a
    corpus-wide array); tf aggregates on (doc, token); df and doc-length
    re-aggregate FROM tf (token space, not occurrence space). The df
    side re-shuffles tf by token — at 100 TB both sides are already
    partial-agg'd, and the tiny n_docs scalar broadcasts. Top-k via
    TakeOrderedAndProject with full tiebreak (doc_id, token) so ties at
    equal tfidf are deterministic for the oracle.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.col("tf").alias("term_count"),
            F.col("df").alias("doc_freq"),
            F.round((F.col("tf") / F.col("doc_len")) * idf, 6).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "doc_id", "token")
        .limit(TFIDF_TOP_K)
    )


def _unigram_xent_ctes() -> str:
    """The per-document unigram-LM cross-entropy derivation
    (tok → tok2 → lm → per_doc) as a CTE chain — ONE textual statement
    shared by the ``unigram_cross_entropy`` oracle and the
    ``perplexity_tercile_split`` oracle, so both engines score every
    document with provably the same LM. Emitted WITHOUT the leading
    ``WITH`` so callers can append their own CTEs."""
    return """tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    ),
    tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    lm AS (
      SELECT token, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM tok2) AS p
      FROM tok2 GROUP BY token
    ),
    per_doc AS (
      SELECT t.doc_id, AVG(-ln(lm.p)) AS xent
      FROM tok2 t JOIN lm ON t.token = lm.token
      GROUP BY t.doc_id
    )"""


def _unigram_xent_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_unigram_xent_ctes`: (doc_id, xent) — the
    corpus unigram LM aggregated once with map-side combine, BROADCAST
    back onto the token stream, per-doc scoring as one aggregation
    keyed by doc_id."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
    ).filter(F.col("token") != "")
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    lm = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select("token", (F.col("n") / F.col("n_total")).alias("p"))
    )
    return (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(F.avg(-F.log("p")).alias("xent"))
    )


@query(
    "unigram_cross_entropy",
    oracle=f"""
    WITH {_unigram_xent_ctes()}
    SELECT d.source,
           COUNT(*) AS n_docs,
           {round_cmp_sql("AVG(pd.xent)")} AS avg_xent,
           ROUND(MIN(pd.xent), 4) AS min_xent,
           ROUND(MAX(pd.xent), 4) AS max_xent
    FROM per_doc pd JOIN documents d ON pd.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def unigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy against the corpus's own unigram LM —
    the cheapest model-based quality signal (the degenerate case of the
    KenLM perplexity filters used on web corpora): documents made of
    rare tokens score high, boilerplate scores low.

    Scale shape: the LM is |vocab| rows (token → corpus probability) —
    aggregated once from the token stream with map-side combine, then
    BROADCAST back onto the same stream; per-doc scoring is one
    aggregation keyed by doc_id. Zipf skew lands on the LM build's
    partial agg (where hot tokens collapse map-side), never on a pair
    join. At 100 TB the vocab still broadcasts (natural-language vocab
    plateaus in the millions); for n-grams, whose key space does NOT
    plateau, :func:`bigram_cross_entropy_hashed` is the certified
    fixed-width-hash variant of the same plan. The scoring derivation
    is shared verbatim with ``perplexity_tercile_split`` — the op that
    turns this signal into the CCNet-style curation action
    (:func:`_unigram_xent_per_doc` / :func:`_unigram_xent_ctes`).
    """
    d = load(spark, sf_dir, "documents")
    per_doc = _unigram_xent_per_doc(spark, sf_dir)
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_cmp(F.avg("xent")).alias("avg_xent"),
            F.round(F.min("xent"), 4).alias("min_xent"),
            F.round(F.max("xent"), 4).alias("max_xent"),
        )
        .orderBy("source")
    )


def _tercile_xe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tercile split's pre-histogram stage: per-doc scores joined
    back to (source, n_chars) and snapped to the certified 4dp grid.
    Factored out so the plan test can pin the stage that runs BEFORE
    the histogram checkpoint (the op's own returned plan only shows
    what's above the checkpoint — r15 review)."""
    d = load(spark, sf_dir, "documents")
    return (
        _unigram_xent_per_doc(spark, sf_dir)
        .join(d.select("doc_id", "source", "n_chars"), "doc_id")
        .select("source", "n_chars", round_cmp(F.col("xent")).alias("xe"))
    )


#: single-slot cache of the persisted tercile histogram, keyed on
#: (session, sf_dir) — exactly one KB-scale histogram is ever cached,
#: mirroring _bpe_train_rules' one-cached-at-a-time discipline (ADVICE
#: r15 item 3). A SAME-KEY repeat REUSES the cached entry rather than
#: re-persisting: two invocations build the IDENTICAL logical plan, so
#: Spark's cache manager gives them ONE shared entry — persist-then-
#: unpersist-the-previous would destroy the new invocation's cache
#: along with the old (verified empirically: "Asked to cache already
#: cached data" followed by an uncached serve plan, r16 review of the
#: first version of this fix). Same path-keyed staleness hazard as
#: _BPE_RULES_CACHE (documented there); the session in the key makes a
#: restarted SparkSession rebuild instead of serving a dead DataFrame.
_TERCILE_HIST_CACHE: list = []


@query(
    "perplexity_tercile_split",
    oracle=f"""
    WITH {_unigram_xent_ctes()},
    xe AS (
      SELECT pd.doc_id, d.source, d.n_chars,
             {round_cmp_sql("pd.xent")} AS xe
      FROM per_doc pd JOIN documents d ON pd.doc_id = d.doc_id
    ),
    hist AS (
      SELECT source, xe, COUNT(*) AS c, SUM(n_chars) AS ch
      FROM xe GROUP BY source, xe
    ),
    cum AS (
      SELECT source, xe, c, ch,
             SUM(c) OVER (PARTITION BY source ORDER BY xe) AS run,
             SUM(c) OVER (PARTITION BY source) AS n
      FROM hist
    ),
    thr AS (
      SELECT source,
             MIN(CASE WHEN run >= (n + 2) // 3 THEN xe END) AS t1,
             MIN(CASE WHEN run >= (2 * n + 2) // 3 THEN xe END) AS t2
      FROM cum GROUP BY source
    ),
    bucketed AS (
      SELECT h.source,
             CASE WHEN h.xe <= t.t1 THEN 'head'
                  WHEN h.xe <= t.t2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             h.c, h.ch, h.xe
      FROM hist h JOIN thr t ON h.source = t.source
    )
    SELECT source, bucket,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(ch) AS BIGINT) AS total_chars,
           {round_cmp_sql("SUM(xe * c) / SUM(c)")} AS avg_xent
    FROM bucketed
    GROUP BY source, bucket
    ORDER BY source, bucket
    """,
)
def perplexity_tercile_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet-style perplexity curation split (r15): score every
    document against the corpus unigram LM (the derivation shared
    verbatim with :func:`unigram_cross_entropy`), then split each
    source's documents into head / middle / tail terciles by
    cross-entropy — the action a web-corpus pipeline actually takes
    with the perplexity signal (CCNet keeps head+middle, drops or
    down-weights tail). Reports per-(source, bucket) document counts,
    character mass (the curation-relevant volume), and mean score.

    Scale shape: tercile thresholds are VALUE-based, computed without
    any per-source global sort — per-doc scores round to the certified
    4dp grid (``round_cmp``, so both engines bucket identical values),
    collapse to a per-source HISTOGRAM of distinct rounded scores (one
    partial-aggregated shuffle; the same histogram-selection trick as
    the distributed exact-quantile engine in functions/quantiles.py),
    and the threshold is a running-count argmin over that histogram —
    the window sorts |distinct 4dp scores| rows per source, never
    |docs|. Ties at a threshold value stay in one bucket (value-based
    semantics: equal scores get equal treatment), so bucket sizes are
    n/3 up to tie spillover — integer-count determinism, no FP
    comparisons beyond the rounded grid. The tiny per-source threshold
    table applies back as a BROADCAST join; at 100 TB nothing here
    exceeds histogram scale except the one per-(source, score) count
    shuffle.

    The oracle replays the identical LM, grid, histogram, and
    threshold selection as CTEs."""
    from pyspark.sql.window import Window

    xe_df = _tercile_xe(spark, sf_dir)
    # the histogram fans out to BOTH the threshold branch and the
    # bucket branch — Catalyst does not dedupe shared subplans (the
    # r5b gotcha), so without a barrier the whole corpus scan + LM
    # build + per-doc scoring would run twice. It is histogram-sized
    # (≤ |distinct 4dp scores| per source — KBs), so materialize once:
    # persist + eager count, NOT localCheckpoint (ADVICE r15 item 3:
    # checkpoint blocks live outside the cache manager and are
    # session-unreleasable — the class the BPE trainer was migrated
    # off in r15), single-slot keyed cache (see _TERCILE_HIST_CACHE
    # for why a same-key repeat must REUSE, never re-persist).
    # Tradeoff (same as the trainer): persist keeps lineage, so a DF
    # returned by an OLDER invocation recomputes (correctly, with the
    # double-scan back) if executed after a different-key call evicts
    # its histogram.
    key = (spark, sf_dir)
    if _TERCILE_HIST_CACHE and _TERCILE_HIST_CACHE[0][0] == key:
        hist = _TERCILE_HIST_CACHE[0][1]
    else:
        hist = (
            xe_df.groupBy("source", "xe")
            .agg(F.count(F.lit(1)).alias("c"), F.sum("n_chars").alias("ch"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            hist.count()  # materialize before the plan fans out
        except BaseException:
            hist.unpersist()
            raise
        if _TERCILE_HIST_CACHE:
            try:
                _TERCILE_HIST_CACHE.pop()[1].unpersist()
            except Exception:
                # best-effort release: the evicted entry may belong to
                # a STOPPED SparkSession (the restart case the keyed
                # cache exists to survive) — dropping the dead entry
                # matters, the unpersist RPC does not (r16 review)
                pass
        _TERCILE_HIST_CACHE.append((key, hist))
    cum = hist.select(
        "*",
        F.sum("c").over(Window.partitionBy("source").orderBy("xe")).alias("run"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    )
    thr = cum.groupBy("source").agg(
        F.min(
            F.when(F.col("run") >= F.floor((F.col("n") + 2) / 3), F.col("xe"))
        ).alias("t1"),
        F.min(
            F.when(F.col("run") >= F.floor((2 * F.col("n") + 2) / 3), F.col("xe"))
        ).alias("t2"),
    )
    bucketed = hist.join(F.broadcast(thr), "source").select(
        "source",
        F.when(F.col("xe") <= F.col("t1"), "head")
        .when(F.col("xe") <= F.col("t2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
        "c",
        "ch",
        "xe",
    )
    return (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum("ch").cast("long").alias("total_chars"),
            round_cmp(F.sum(F.col("xe") * F.col("c")) / F.sum("c")).alias(
                "avg_xent"
            ),
        )
        .orderBy("source", "bucket")
    )


#: tokenizer-training vocabulary size for the coverage report
_VOCAB_SIZE = 1000


@query(
    "vocab_oov_rate",
    oracle=f"""
    WITH t AS (
      SELECT source, tok
      FROM (
        SELECT source,
               unnest(regexp_split_to_array({_NORM_ASCII_SQL}, ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
    ),
    vocab AS (
      SELECT tok FROM t
      GROUP BY tok
      ORDER BY COUNT(*) DESC, tok
      LIMIT {_VOCAB_SIZE}
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           {round_cmp_sql("SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")}
             AS oov_rate
    FROM t LEFT JOIN vocab v USING (tok)
    GROUP BY source
    ORDER BY source
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the top-{_VOCAB_SIZE} corpus vocabulary
    by token frequency (deterministic tie-break on the token itself),
    then report each source's out-of-vocabulary occurrence rate — the
    tokenizer-training sanity check run before fixing a vocab, and the
    drift alarm run after (a source whose OOV rate jumps is feeding the
    model unseen script/jargon).

    Scale shape: token explode is narrow; the frequency count is one
    hash-agg shuffle with map-side partial counts; the top-V cut is
    TakeOrderedAndProject (V rows to the driver, never a global sort);
    and the vocab side of the membership join is BROADCAST — the big
    token stream is never shuffled for the join, so the whole plan adds
    exactly one shuffle beyond the final per-source rollup.
    """
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(
            "source",
            F.explode(F.split(_norm_ascii(F.col("text")), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    oov = F.col("__in_vocab").isNull().cast("long")
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
            round_cmp(F.sum(oov) / F.count(F.lit(1))).alias("oov_rate"),
        )
        .orderBy("source")
    )


#: BPE merge-candidate report size
_BPE_TOP = 50


def _word_freq_cte(name: str) -> str:
    """The (word, count) table as a named CTE — ONE textual statement
    of the word-frequency contract shared by the single-round
    :func:`bpe_pair_counts` oracle and the iterated
    :func:`bpe_train_merges` oracle (r14 review: the second copy had
    already drifted into existence)."""
    return f"""{name} AS (
      SELECT tok AS w, COUNT(*) AS wn
      FROM (
        SELECT unnest(regexp_split_to_array({_NORM_ASCII_SQL}, ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
      GROUP BY tok
    )"""


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_word_freq_cte`: collapse the corpus to the
    DISTINCT-WORD table (one hash-agg with map-side partials) — the
    occurrence→type-space trick every BPE step runs on."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(_norm_ascii(F.col("text")), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH {_word_freq_cte("w")},
    pairs AS (
      SELECT substr(w, i, 2) AS pair, wn FROM (
        SELECT w, wn, unnest(generate_series(1, length(w) - 1)) AS i FROM w)
    )
    SELECT pair, CAST(SUM(wn) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY pair
    ORDER BY n_pairs DESC, pair
    LIMIT {_BPE_TOP}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, step 1 at corpus scale: count adjacent
    character pairs weighted by word frequency — the statistic whose
    argmax picks each merge. Reported as the top-{_BPE_TOP} merge
    candidates.

    Scale shape: the corpus collapses to the DISTINCT-WORD table first
    (one hash-agg with map-side partials — pair explosion then runs
    over |vocab| rows, not |corpus| occurrences, the same occurrence→
    type-space trick as tfidf_top_terms); pair extraction is a narrow
    substring explode inside codegen; the final count is one shuffle of
    (pair, partial-sum) rows and a TakeOrderedAndProject top-k. The
    full iterated trainer is :func:`bpe_train_merges` (r14) — each of
    its iterations stays this same linear shape.
    """
    words = _word_freq(spark, sf_dir)
    starts = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = words.select(
        "wn",
        F.explode(
            F.transform(starts, lambda i: F.col("w").substr(i, F.lit(2)))
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").cast("long").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "pair")
        .limit(_BPE_TOP)
    )


#: merge rounds for the iterated BPE trainer — enough to exercise
#: multi-symbol merges (pairs whose sides are themselves merge
#: products) while keeping the unrolled oracle chain readable
_BPE_MERGES = 6


def _bpe_merge_fold(s, l: str, r: str):
    """CANONICAL greedy BPE merge of pair (l, r) over a space-joined
    symbol string, as a string-accumulator left fold: walk the symbols;
    when the last emitted symbol is ``l`` and the next is ``r``, rewrite
    the tail to the merged symbol, else append — exactly left-to-right
    non-overlapping symbol-space merging. DuckDB's ``list_reduce`` twin
    is :data:`_BPE_MERGE_FOLD_SQL`; the two folds are pinned
    identical on the adjacent-run ('a b a b') and identical-symbol-run
    ('b b b b b') cases where a naive string ``replace`` disagrees
    (it consumes the shared separator and skips the follow-up
    occurrence — caught by the r14 round review)."""
    return F.aggregate(
        F.split(s, " "),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            ((acc == F.lit(l)) | acc.endswith(F.lit(" " + l))) & (x == F.lit(r)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - len(l)), F.lit(l + r)
            ),
        )
        .otherwise(F.concat(acc, F.lit(" "), x)),
    )


#: the char→symbol-string "symbolize" step ('word' → 'w o r d') as ONE
#: cross-engine pair — the r15 review found seven inline copies (three
#: in this module, one in dump_plans, two in tests, plus the two oracle
#: CTEs), the exact drift class :func:`_word_freq_cte` was factored to
#: close in r14. Edit here, never inline.
_BPE_SYMBOLIZE_SQL = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"


def _bpe_symbolize(col):
    """Spark twin of :data:`_BPE_SYMBOLIZE_SQL`."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


#: DuckDB twin of :func:`_bpe_merge_fold` — interpolated into every
#: oracle CTE that applies a learned merge (the trainer's w-chain and
#: the encoder's e-chain read the IDENTICAL fold text, so their merge
#: semantics can't drift apart). References the merge rule as ``b.l`` /
#: ``b.r``, so the enclosing CTE must bring the 1-row rule table into
#: scope as ``b``.
_BPE_MERGE_FOLD_SQL = """list_reduce(str_split(s, ' '),
                      (acc, x) -> CASE
                        WHEN (acc = b.l OR ends_with(acc, ' ' || b.l)) AND x = b.r
                          THEN left(acc, length(acc) - length(b.l)) || b.l || b.r
                        ELSE acc || ' ' || x END)"""


def _bpe_chain_sql(words: str) -> str:
    """The trainer's count→argmax→merge CTE chain (w0 … w{_BPE_MERGES},
    p_t, b_t — the final w applies ALL learned merges; the vocab oracle
    reads it) over the word-frequency CTE named ``words`` — ONE textual
    statement of the learned-rules contract shared by the trainer,
    encoder, and vocabulary oracles, so every engine's rule tables
    b1…bN are provably the same derivation. Emitted WITHOUT the leading
    ``WITH`` so callers can prepend their own CTEs.

    Each round's merge is a LEFT JOIN against the (≤1-row) rule table
    with an identity fallback: when a round learns NO rule (pair counts
    exhaust before {_BPE_MERGES} rounds — every word already a single
    symbol), ``b_t`` is empty and ``w_t`` must carry ``w_(t-1)`` forward
    unchanged, exactly as the Spark loop's early ``break`` leaves the
    remaining rounds unapplied. The r15 review caught the original
    CROSS-join form emptying every downstream CTE on such corpora —
    the trainer's b-union happened to agree, but the vocab/encoder
    oracles read the final w/e table and returned 0 rows where Spark
    returned real data (pinned by
    tests/test_llm_ops.py::test_bpe_oracles_survive_merge_exhaustion).
    """
    parts = [
        f"""
    w0 AS (SELECT {_BPE_SYMBOLIZE_SQL} AS s, wn
           FROM {words})"""
    ]
    for t in range(1, _BPE_MERGES + 1):
        parts.append(
            f""",
    p{t} AS (
      SELECT a[i] AS l, a[i + 1] AS r, SUM(wn) AS cnt FROM (
        SELECT str_split(s, ' ') AS a,
               unnest(generate_series(1, len(str_split(s, ' ')) - 1)) AS i,
               wn
        FROM w{t - 1})
      GROUP BY l, r),
    b{t} AS (SELECT l, r, cnt FROM p{t} ORDER BY cnt DESC, l, r LIMIT 1),
    w{t} AS (SELECT CASE WHEN b.l IS NULL THEN s
                         ELSE {_BPE_MERGE_FOLD_SQL} END AS s, wn
             FROM w{t - 1} LEFT JOIN b{t} b ON TRUE)"""
        )
    return "".join(parts)


def _bpe_train_oracle_sql() -> str:
    """The trainer's DuckDB twin as {_BPE_MERGES} unrolled
    count→argmax→merge CTE rounds over the symbol-string
    representation (the same unroll-the-iteration pattern as the
    k-means chains). All statistics are INTEGER counts with a
    lexicographic (l, r) tiebreak — no FP pins needed. The merge is
    the CANONICAL greedy left-to-right non-overlapping rewrite,
    expressed as a string-accumulator left fold (``list_reduce``;
    Spark's ``aggregate`` is the verified-identical twin — a naive
    string ``replace`` was reviewed OUT in r14: it consumes the shared
    separator and skips back-to-back occurrences, so ' a b a b ' kept
    an unmerged pair). The round chain itself lives in
    :func:`_bpe_chain_sql`, shared verbatim with the encoder oracle
    (generated SQL verified byte-identical to the r14 text)."""
    parts = [
        f"""
    WITH {_word_freq_cte("words")},{_bpe_chain_sql("words")}"""
    ]
    union = "\n      UNION ALL ".join(
        f"SELECT {t} AS step, l, r, cnt FROM b{t}" for t in range(1, _BPE_MERGES + 1)
    )
    parts.append(
        f"""
    SELECT CAST(step AS BIGINT) AS step, l AS merge_left, r AS merge_right,
           l || r AS merged, CAST(cnt AS BIGINT) AS pair_count
    FROM ({union})
    ORDER BY step"""
    )
    return "".join(parts)


#: session-scope cache of the learned merge rules, keyed on the fit
#: inputs — the same shared-fit discipline as similarity.py's quantizer
#: cache: the encoder op consumes the EXACT rule list the certified
#: trainer learned (and vice versa), and a repeated driver run doesn't
#: re-pay the {_BPE_MERGES} training rounds. The training derivation is
#: fully deterministic (integer counts, lexicographic tiebreak), so the
#: cache is a cost optimization, never a correctness dependency —
#: tests pop the key and re-derive to prove it.
#:
#: HAZARD (ADVICE r15 item 2): the key is (sf_dir, _BPE_MERGES) only —
#: it identifies the dataset by PATH, not content. If the parquet under
#: an sf_dir is rewritten mid-session, the trainer/encoder/vocab ops
#: serve rules learned from the OLD bytes; any test or job that mutates
#: a table in place must pop the key first (as
#: test_bpe_oracles_survive_merge_exhaustion does in its finally). Left
#: path-keyed deliberately: the driver corpus is read-only by contract
#: (TESTDATA.md), and an mtime/size fingerprint would force a
#: filesystem stat on every call for a hazard the contract already
#: excludes.
_BPE_RULES_CACHE: dict[tuple, list] = {}


def _bpe_round_pairs(cur: DataFrame) -> DataFrame:
    """One training round's pair-count statistic over the symbol-string
    vocab table ``cur``: a narrow codegen'd adjacent-pair explode and
    one (l, r)-keyed partial-aggregated count shuffle. Factored out so
    the plan-shape test pins exactly what each round executes."""
    arr = F.split(F.col("s"), " ")
    idx = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = cur.select(
        "wn",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(arr, i).alias("l"),
                    F.element_at(arr, i + 1).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("wn").cast("long").alias("cnt"))


def _bpe_train_rules(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Run the {_BPE_MERGES}-round greedy BPE training loop and return
    the learned rules ``[(step, l, r, merged, count), …]`` — shared by
    the trainer op (which ships the table) and the encoder op (which
    applies the rules to the corpus).

    Each round's vocab table is persisted MEMORY_AND_DISK and eagerly
    materialized; once round N+1's table is materialized (reading round
    N's cache, not its lineage), round N's blocks are unpersisted —
    exactly one round's vocab is ever cached (ADVICE r14: the previous
    localCheckpoint-per-round form accumulated every round's blocks for
    the session, and ``DataFrame.unpersist()`` is a no-op on
    localCheckpoint blocks — they live on the internal RDD, outside the
    cache manager, verified empirically this round — so the fix is
    cacheManager-tracked persist, not an unpersist call bolted onto the
    checkpoint). The tradeoff: persist doesn't truncate lineage, so
    round N's logical plan nests N fold expressions; bounded by
    _BPE_MERGES ({_BPE_MERGES}) — if that ever grows past ~50, add a
    periodic localCheckpoint every K rounds to cap optimizer cost."""
    key = (sf_dir, _BPE_MERGES)
    if key in _BPE_RULES_CACHE:
        return _BPE_RULES_CACHE[key]
    cur = (
        _word_freq(spark, sf_dir)
        .select(_bpe_symbolize(F.col("w")).alias("s"), "wn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rules: list[tuple] = []
    # try/finally so a mid-training failure (task loss, interrupt)
    # can't strand this round's blocks for the session — the leak class
    # this function exists to prevent (r15 review)
    try:
        cur.count()  # materialize round 0 before the loop reads it twice
        for step in range(1, _BPE_MERGES + 1):
            best = (
                _bpe_round_pairs(cur)
                .orderBy(F.desc("cnt"), "l", "r")
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
            rules.append((step, l, r, l + r, cnt))
            if step < _BPE_MERGES:  # the final round's merge is never read
                nxt = cur.select(
                    _bpe_merge_fold(F.col("s"), l, r).alias("s"), "wn"
                ).persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    nxt.count()  # materialize THROUGH cur's cache…
                except BaseException:
                    nxt.unpersist()  # …freeing BOTH on failure (cur
                    raise  # is released by the outer finally)
                cur.unpersist()  # …then free the superseded round
                cur = nxt
    finally:
        cur.unpersist()  # the live round's vocab is never read again
    _BPE_RULES_CACHE[key] = rules
    return rules


@query("bpe_train_merges", oracle=_bpe_train_oracle_sql())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full iterated BPE tokenizer trainer at corpus scale:
    {_BPE_MERGES} greedy merge rounds, each counting adjacent symbol
    pairs weighted by word frequency, picking the most frequent pair
    (lexicographic (left, right) tiebreak — integer counts, so no FP
    pins are needed anywhere), and merging every non-overlapping
    left-to-right occurrence across the vocabulary. Returns the learned
    merge table (step, merge_left, merge_right, merged, pair_count) —
    the artifact a BPE tokenizer ships. ``bpe_encode_corpus`` (r15) is
    the consumer: it applies this table to the corpus.

    Scale shape: the corpus collapses ONCE to the distinct-word table
    (the only corpus-sized shuffle — the same occurrence→type-space
    trick as :func:`bpe_pair_counts`, shared via :func:`_word_freq`);
    every merge round then runs over |vocab| rows: a narrow codegen'd
    pair explode, one (l, r)-keyed partial-aggregated count shuffle,
    and a bounded 1-row argmax to the driver (the merge rule is a
    driver-scale index artifact, exactly like the k-means centroids).
    The merge itself is the CANONICAL greedy left-to-right
    non-overlapping rewrite, expressed as a narrow string-accumulator
    left fold (``aggregate``; DuckDB's ``list_reduce`` is the
    verified-identical twin — tests pin the fold on the adjacent- and
    identical-symbol run cases where a naive string ``replace``
    genuinely disagrees with symbol-space BPE). Exactly one round's
    vocab table is cached at a time (see :func:`_bpe_train_rules`);
    the final round skips the never-read merge. At 100 TB the word
    table is ~10⁷ rows regardless of corpus size — tokenizer training
    cost is corpus-scan + sub-second rounds, which is exactly why
    production BPE trainers work from the word-frequency table.

    The oracle replays all {_BPE_MERGES} rounds as unrolled CTEs
    (:func:`_bpe_train_oracle_sql`)."""
    rules = _bpe_train_rules(spark, sf_dir)
    return spark.createDataFrame(
        rules,
        "step long, merge_left string, merge_right string, merged string, pair_count long",
    ).orderBy("step")


def _bpe_vocab_oracle_sql() -> str:
    """The vocabulary op's DuckDB twin: the trainer's full rule
    derivation (:func:`_bpe_chain_sql`, shared verbatim) already ends
    in w{_BPE_MERGES} — the word table with ALL merges applied — so the
    vocabulary is one unnest + weighted count over it, flagged against
    the union of the learned rules' merge products."""
    union = "\n        UNION ALL ".join(
        f"SELECT l || r AS merged FROM b{t}" for t in range(1, _BPE_MERGES + 1)
    )
    return f"""
    WITH {_word_freq_cte("words")},{_bpe_chain_sql("words")},
    merged_syms AS ({union}),
    occ AS (
      SELECT unnest(str_split(s, ' ')) AS symbol, wn
      FROM w{_BPE_MERGES}
    )
    SELECT symbol,
           CAST(SUM(wn) AS BIGINT) AS n_occurrences,
           symbol IN (SELECT merged FROM merged_syms) AS is_merge_product
    FROM occ
    GROUP BY symbol
    ORDER BY n_occurrences DESC, symbol
    LIMIT {_BPE_TOP}"""


@query("bpe_vocab_topk", oracle=_bpe_vocab_oracle_sql())
def bpe_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE vocabulary (r15): the distinct symbols of the
    corpus after all {_BPE_MERGES} merges, with corpus-weighted
    occurrence counts and a flag marking merge products vs surviving
    single characters — the top-{_BPE_TOP} slice of the vocab file a
    BPE tokenizer ships alongside its merge table. Completes the
    tokenizer-prep shelf: pair counts → trainer → VOCAB → encoder
    stats → ``vocab_oov_rate``.

    Scale shape: the learned rules come from the shared rules cache
    (:data:`_BPE_RULES_CACHE` — driver-scale literals, zero joins);
    the folds compose into one narrow codegen'd expression over the
    |vocab| word table (the corpus collapsed once, the same
    occurrence→type-space trick as the trainer); the symbol count is a
    narrow explode + one partial-aggregated shuffle of (symbol,
    partial-sum) rows + a TakeOrderedAndProject top-k — identical
    linear shape to :func:`bpe_pair_counts`.

    The oracle re-derives the rules with the trainer's own CTE chain
    and counts symbols over its final w{_BPE_MERGES} table
    (:func:`_bpe_vocab_oracle_sql`)."""
    rules = _bpe_train_rules(spark, sf_dir)
    merged = sorted({m for _s, _l, _r, m, _c in rules})
    enc = _word_freq(spark, sf_dir).select(
        _bpe_symbolize(F.col("w")).alias("s"), "wn"
    )
    for _step, l, r, _merged, _cnt in rules:
        enc = enc.select(_bpe_merge_fold(F.col("s"), l, r).alias("s"), "wn")
    return (
        enc.select(F.explode(F.split("s", " ")).alias("symbol"), "wn")
        .groupBy("symbol")
        .agg(F.sum("wn").cast("long").alias("n_occurrences"))
        .select(
            "symbol",
            "n_occurrences",
            F.col("symbol").isin(merged).alias("is_merge_product"),
        )
        .orderBy(F.desc("n_occurrences"), "symbol")
        .limit(_BPE_TOP)
    )


def _src_word_freq_cte(name: str) -> str:
    """Per-source (source, word, count) table as a named CTE — the
    encoder's corpus-side input (the trainer's :func:`_word_freq_cte`
    is its roll-up over sources)."""
    return f"""{name} AS (
      SELECT source, tok AS w, COUNT(*) AS wn
      FROM (
        SELECT source,
               unnest(regexp_split_to_array({_NORM_ASCII_SQL}, ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
      GROUP BY source, tok
    )"""


def _src_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_src_word_freq_cte`: collapse the corpus to
    the per-source distinct-word table — one hash-agg with map-side
    partials, after which every encoding fold runs in type space."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            F.explode(F.split(_norm_ascii(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("wn"))
    )


def _bpe_encode_oracle_sql() -> str:
    """The encoder's DuckDB twin: the trainer's full rule derivation
    (:func:`_bpe_chain_sql`, shared verbatim, so b1…b{_BPE_MERGES} are
    provably the rules the certified trainer learns) + an e-chain that
    applies each rule to the PER-SOURCE word table with the identical
    merge fold (:data:`_BPE_MERGE_FOLD_SQL`), then per-source token
    statistics."""
    parts = [
        f"""
    WITH {_src_word_freq_cte("src_words")},
    words AS (SELECT w, SUM(wn) AS wn FROM src_words GROUP BY w),{_bpe_chain_sql("words")},
    e0 AS (SELECT source, {_BPE_SYMBOLIZE_SQL} AS s,
                  length(w) AS ch, wn
           FROM src_words)"""
    ]
    for t in range(1, _BPE_MERGES + 1):
        parts.append(
            f""",
    e{t} AS (SELECT source, CASE WHEN b.l IS NULL THEN s
                                 ELSE {_BPE_MERGE_FOLD_SQL} END AS s, ch, wn
             FROM e{t - 1} LEFT JOIN b{t} b ON TRUE)"""
        )
    parts.append(
        f"""
    SELECT source,
           CAST(SUM(wn) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_word_types,
           CAST(SUM(ch * wn) AS BIGINT) AS total_chars,
           CAST(SUM(len(str_split(s, ' ')) * wn) AS BIGINT) AS total_tokens,
           {round_cmp_sql("SUM(ch * wn) * 1.0 / SUM(len(str_split(s, ' ')) * wn)")} AS chars_per_token,
           {round_cmp_sql("SUM(len(str_split(s, ' ')) * wn) * 1.0 / SUM(wn)")} AS tokens_per_word
    FROM e{_BPE_MERGES}
    GROUP BY source
    ORDER BY source"""
    )
    return "".join(parts)


@query("bpe_encode_corpus", oracle=_bpe_encode_oracle_sql())
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer's consumer (r15, VERDICT r14 item 2): apply the
    learned merge table to the corpus and report per-source tokenizer
    statistics — word occurrences, word types, character volume, token
    volume after all {_BPE_MERGES} merges, and the two ratios a
    tokenizer-prep pipeline actually tracks (chars/token = compression
    vs a char-level baseline; tokens/word = fertility). This closes the
    train → encode → stats loop the way ``vocab_oov_rate`` consumed the
    top-V vocabulary (SURVEY §7.5's tokenizer-prep shelf).

    Scale shape: encoding runs ENTIRELY in type space — the corpus
    collapses once to the per-source distinct-word table
    (:func:`_src_word_freq`, one hash-agg with map-side partials; the
    only corpus-sized shuffle), then each learned rule applies as a
    narrow string-accumulator fold (:func:`_bpe_merge_fold`) with the
    rule folded in as a LITERAL — the plan has ZERO joins: the merge
    table is a driver-scale artifact, reused via the shared rules
    cache (:data:`_BPE_RULES_CACHE`), exactly like the k-means
    centroid literals. The {_BPE_MERGES} folds compose into one
    codegen'd expression over |src_vocab| rows; the per-source stats
    are one tiny final aggregation. At 100 TB: corpus scan + a
    vocab-sized narrow stage — the encode cost a production tokenizer
    pipeline pays for the word-frequency shortcut.

    The oracle re-derives the rules with the trainer's own CTE chain
    (shared verbatim via :func:`_bpe_chain_sql`) and applies them with
    the identical fold text, so both engines train AND encode the same
    way (:func:`_bpe_encode_oracle_sql`)."""
    rules = _bpe_train_rules(spark, sf_dir)
    enc = _src_word_freq(spark, sf_dir).select(
        "source",
        _bpe_symbolize(F.col("w")).alias("s"),
        F.length("w").alias("ch"),
        "wn",
    )
    for _step, l, r, _merged, _cnt in rules:
        enc = enc.select(
            "source", _bpe_merge_fold(F.col("s"), l, r).alias("s"), "ch", "wn"
        )
    ntok = F.size(F.split(F.col("s"), " "))
    return (
        enc.groupBy("source")
        .agg(
            F.sum("wn").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_word_types"),
            F.sum(F.col("ch") * F.col("wn")).cast("long").alias("total_chars"),
            F.sum(ntok * F.col("wn")).cast("long").alias("total_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_word_types",
            "total_chars",
            "total_tokens",
            round_cmp(F.col("total_chars") / F.col("total_tokens")).alias(
                "chars_per_token"
            ),
            round_cmp(F.col("total_tokens") / F.col("n_words")).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("source")
    )


@query(
    "source_vocab_overlap",
    oracle=f"""
    WITH t AS (
      SELECT DISTINCT source, tok
      FROM (
        SELECT source,
               unnest(regexp_split_to_array({_NORM_ASCII_SQL}, ' ')) AS tok
        FROM documents
      )
      WHERE tok <> ''
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM t GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_inter
      FROM t a JOIN t b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT source_a, source_b, n_inter,
           ROUND(n_inter * 1.0 / (sa.n + sb.n - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY source_a, source_b
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap: pairwise token-set Jaccard
    between corpus sources — the mixture-design diagnostic that tells
    you whether two sources contribute distinct language or redundant
    mass (pairs near 1.0 are near-duplicate slices; near 0.0, disjoint
    domains).

    Scale shape: the corpus collapses to the DISTINCT (source, token)
    table first (one hash-agg, type space); the pair join is an
    equi-join ON TOKEN — Σfreq(token)² across sources, never
    |vocab|² — and source count is tiny, so the output and the
    per-source size table are driver-scale. Same blocking discipline as
    every near-dup operator in dedup.py.
    """
    d = load(spark, sf_dir, "documents")
    t = (
        d.select(
            "source", F.explode(F.split(_norm_ascii(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    sizes = t.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = t.alias("a"), t.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


#: the SHARED bigram-occurrence stream (doc_id, w1, w2) over the
#: alpha-tokenized text — DuckDB CTE fragment; :func:`_bigram_pairs` is
#: its Spark twin. Consumed by bigram_cross_entropy and its
#: feature-hashed scale twin — edit here, never inline.
_BIGRAM_PAIRS_SQL = f"""tok AS (
      SELECT doc_id,
             {ALPHA_TOKENIZE_SQL} AS a
      FROM documents
    ),
    big AS (
      SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS bg
      FROM tok WHERE len(a) >= 2
    ),
    pairs AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM big)"""


def _bigram_pairs(d: DataFrame) -> DataFrame:
    """Spark twin of :data:`_BIGRAM_PAIRS_SQL`: one row per bigram
    OCCURRENCE (doc_id, w1, w2). Construction is NARROW — the token
    array is zipped with its own tail inside the row (no window, no
    self-join); the array is projected as a column before the zip_with
    lambda per the lambda-projection rule."""
    toks = d.select(
        "doc_id",
        F.expr(ALPHA_TOKENIZE_EXPR).alias("a"),
    ).filter(F.size("a") >= 2)
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),"
                " (x, y) -> named_struct('w1', x, 'w2', y))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


@query(
    "bigram_cross_entropy",
    oracle=f"""
    WITH {_BIGRAM_PAIRS_SQL},
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM pairs GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM pairs GROUP BY w1),
    lm AS (SELECT c2.w1, c2.w2, c2.n2 * 1.0 / c1.n1 AS p
           FROM c2 JOIN c1 ON c2.w1 = c1.w1),
    per_doc AS (
      SELECT pr.doc_id, AVG(-ln(lm.p)) AS xent
      FROM pairs pr JOIN lm ON pr.w1 = lm.w1 AND pr.w2 = lm.w2
      GROUP BY pr.doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           {round_cmp_sql("AVG(pd.xent)")} AS avg_xent,
           ROUND(MIN(pd.xent), 4) AS min_xent,
           ROUND(MAX(pd.xent), 4) AS max_xent
    FROM per_doc pd JOIN documents d ON pd.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy against the corpus's own BIGRAM LM —
    one rung up the n-gram ladder from ``unigram_cross_entropy``:
    p(w₂|w₁) = c(w₁w₂)/c(w₁·), scored as the mean −ln p over each
    document's bigrams (documents under two tokens have no bigrams and
    drop out on both sides). Catches word-salad that unigram statistics
    cannot: rare TRANSITIONS score high even when every token is common.

    Scale shape: bigram construction is NARROW (the shared
    :func:`_bigram_pairs` stream); the conditional LM is two
    partial-agg'd counts joined on w₁; scoring joins the bigram stream
    against the broadcast LM. At 100 TB the bigram vocab outgrows
    broadcast range — :func:`bigram_cross_entropy_hashed` is the
    certified production twin that feature-hashes the bigram to a
    fixed-width id (same plan, bounded key space).
    """
    d = load(spark, sf_dir, "documents")
    pairs = _bigram_pairs(d)
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    lm = c2.join(c1, "w1").select("w1", "w2", (F.col("n2") / F.col("n1")).alias("p"))
    per_doc = (
        pairs.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.avg(-F.log("p")).alias("xent"))
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_cmp(F.avg("xent")).alias("avg_xent"),
            F.round(F.min("xent"), 4).alias("min_xent"),
            F.round(F.max("xent"), 4).alias("max_xent"),
        )
        .orderBy("source")
    )


#: feature-hash widths for the hashed bigram LM: context (w₁) and
#: bigram buckets. The LM is AT MOST _HASH_B1 + _HASH_B2 rows at ANY
#: corpus size — that's the whole point: broadcast range is engineered,
#: not vocabulary-dependent.
_HASH_B1 = 1 << 16
_HASH_B2 = 1 << 18


@query(
    "bigram_cross_entropy_hashed",
    oracle=f"""
    WITH {_BIGRAM_PAIRS_SQL},
    hp AS (
      SELECT doc_id,
             ('0x' || substr(md5(w1 || chr(31) || w2), 1, 8))::BIGINT % {_HASH_B2} AS hb,
             ('0x' || substr(md5(w1), 1, 8))::BIGINT % {_HASH_B1} AS h1
      FROM pairs
    ),
    c2 AS (SELECT hb, COUNT(*) AS n2 FROM hp GROUP BY hb),
    c1 AS (SELECT h1, COUNT(*) AS n1 FROM hp GROUP BY h1),
    per_doc AS (
      SELECT hp.doc_id, AVG(-ln(c2.n2 * 1.0 / c1.n1)) AS xent
      FROM hp JOIN c2 USING (hb) JOIN c1 USING (h1)
      GROUP BY hp.doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           {round_cmp_sql("AVG(pd.xent)")} AS avg_xent,
           ROUND(MIN(pd.xent), 4) AS min_xent,
           ROUND(MAX(pd.xent), 4) AS max_xent
    FROM per_doc pd JOIN documents d ON pd.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def bigram_cross_entropy_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed bigram cross-entropy — the certified 100 TB twin
    of :func:`bigram_cross_entropy` (VERDICT r8 item 4: the broadcast
    bigram LM was the one named scale-killer without a certified scale
    path). The hashing trick replaces unbounded vocabulary keys with
    fixed-width md5 buckets: the bigram hashes to one of {_HASH_B2}
    ids, its context word to one of {_HASH_B1}, and the LM estimate is
    p̂(w₂|w₁) = c(h(w₁w₂)) / c(h(w₁)) — so the LM is AT MOST
    {_HASH_B1} + {_HASH_B2} rows no matter how large the corpus, and
    the broadcast that breaks the exact op at scale becomes a hard
    engineering bound. Same output shape as the exact op so fidelity is
    directly measurable (tests pin hashed-vs-exact divergence; at small
    vocab the two agree closely, and estimates converge as the widths
    grow).

    Collision semantics, stated honestly: bucket collisions MERGE
    counts, so p̂ is noisy and can exceed 1 when a bigram bucket
    aggregates more mass than its context bucket (the per-bigram −ln p̂
    term then dips negative). That is the standard hashing-trick
    trade-off — bounded memory for bounded, unbiased-enough noise — and
    it vanishes as widths grow; the exact op remains registered as the
    parity tier.

    Scale shape: identical to the exact op except every LM key is a
    fixed-width integer: narrow bigram construction (shared
    :func:`_bigram_pairs`), two bounded partial-agg'd counts, broadcast
    joins on int keys (cheaper to hash and ship than string pairs), one
    per-doc aggregation. Zipf skew still collapses map-side. The md5
    bucket expressions are engine-identical (same pattern the minhash
    and hash-split ops certify), which is what lets DuckDB replay the
    entire hashed pipeline."""
    d = load(spark, sf_dir, "documents")
    pairs = _bigram_pairs(d)
    hp = pairs.select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.encode(
                            F.concat(F.col("w1"), F.lit("\x1f"), F.col("w2")),
                            "UTF-8",
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _HASH_B2
        ).alias("hb"),
        (
            F.conv(
                F.substring(F.md5(F.encode(F.col("w1"), "UTF-8")), 1, 8), 16, 10
            ).cast("long")
            % _HASH_B1
        ).alias("h1"),
    )
    c2 = hp.groupBy("hb").agg(F.count(F.lit(1)).alias("n2"))
    c1 = hp.groupBy("h1").agg(F.count(F.lit(1)).alias("n1"))
    per_doc = (
        hp.join(F.broadcast(c2), "hb")
        .join(F.broadcast(c1), "h1")
        .groupBy("doc_id")
        .agg(F.avg(-F.log(F.col("n2") / F.col("n1"))).alias("xent"))
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round_cmp(F.avg("xent")).alias("avg_xent"),
            F.round(F.min("xent"), 4).alias("min_xent"),
            F.round(F.max("xent"), 4).alias("max_xent"),
        )
        .orderBy("source")
    )


#: a doc repeating more than this fraction of its word-3-gram shingles
#: is flagged (corpus P99 ≈ 0.018, max ≈ 0.071 — the bar catches the
#: tail without flagging ordinary prose)
_SELF_REP_FLAG = 0.01


@query(
    "doc_self_repetition",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang,
             greatest(len(toks) - 2, 0) AS total,
             len(list_distinct({word3_shingles_sql("toks")})) AS uniq
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array({_NORM_ASCII_SQL}, ' ') AS toks
            FROM documents)
    ),
    rr AS (
      SELECT lang, {round_cmp_sql("1.0 - uniq * 1.0 / total", 6)} AS rep
      FROM sh WHERE total > 0
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {round_cmp_sql("AVG(rep)")} AS avg_rep,
           {round_cmp_sql("MAX(rep)")} AS max_rep,
           CAST(SUM(CASE WHEN rep >= {_SELF_REP_FLAG!r} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM rr GROUP BY lang ORDER BY lang
    """,
)
def doc_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRA-document repetition score: the fraction of a doc's word
    3-gram shingles that are repeats of an earlier shingle in the SAME
    doc (1 − distinct/total) — the self-similarity rung of the
    repetition ladder (``text_repetition_flags`` tracks top-word share;
    this catches looping/boilerplate passages whose vocabulary looks
    normal but whose phrase structure cycles, the classic generation-
    artifact filter). Docs under 3 tokens carry no shingles and are
    excluded from the audit.

    Scale shape: shingling, dedup, and the rate are all IN-ROW array
    expressions (``transform``/``array_distinct`` over the token
    array — no explode, no shuffle of shingle rows, unlike the
    cross-doc dedup family which must shuffle the inverted index); the
    per-language audit is one partial-aggregated shuffle of |lang|
    groups. The flag threshold compares the rate rounded via the
    round_cmp PAIR (6dp, identical IEEE tie-break both engines — plain
    ROUND diverges HALF_UP vs half-even exactly at thresholds like
    this one) so boundary docs can't flip between engines.

    Shingles come from the SHARED :func:`word3_shingles` pair (hoisted
    r9 — the same definition ``dedup._shingle_index`` consumes; until
    then the two modules carried mirrored copies patrolled by a
    lockstep test). The token array is projected as a column BEFORE the
    helper's per-element lambdas (the lambda-projection rule — see the
    helper's docstring; measured 13 s → 0.06 s here). Corpora with
    truly huge single documents would switch to explode + per-doc
    aggregation (same answers, shingle rows shuffled instead of held
    in one array cell — measured equal-speed here)."""
    d = load(spark, sf_dir, "documents")
    t = d.select("lang", F.split(_norm_ascii(F.col("text")), " ").alias("toks"))
    tk = F.col("toks")
    n = F.size(tk)
    shingles = word3_shingles(tk)
    sh = t.select(
        "lang",
        F.greatest(n - 2, F.lit(0)).alias("total"),
        F.size(F.array_distinct(shingles)).alias("uniq"),
    )
    rep = round_cmp(F.lit(1.0) - F.col("uniq") * F.lit(1.0) / F.col("total"), 6)
    return (
        sh.filter(F.col("total") > 0)
        .select("lang", rep.alias("rep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            round_cmp(F.avg("rep")).alias("avg_rep"),
            round_cmp(F.max("rep")).alias("max_rep"),
            F.sum((F.col("rep") >= _SELF_REP_FLAG).cast("int"))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("lang")
    )
