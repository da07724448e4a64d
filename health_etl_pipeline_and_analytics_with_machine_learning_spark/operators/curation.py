"""End-to-end corpus curation — the composed training-data pipeline a
user actually runs: quality gate → canonical-fingerprint dedup →
per-slice corpus statistics. One DataFrame chain, one SQL oracle.

This is the integration query over the text/dedup building blocks
(text.text_quality_score semantics, doc_fingerprint, exact dedup):
each stage alone is oracle-checked elsewhere; this one pins their
composition.

Scale shape (the order of stages IS the optimization):
1. the quality gate is a scan-level filter — cheapest first, it prunes
   before anything shuffles;
2. dedup keeps one doc per md5(normalized text) via row_number over the
   fingerprint — ONE shuffle keyed by a uniformly-distributed hash (no
   skew by construction);
3. the surviving rows partial-aggregate into |lang × source| rows.
At 100 TB nothing in this plan materializes more than the winning rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, query
from .text import _NORM_SQL, _norm


@query(
    "corpus_curation",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
             length(text) AS n_chars,
             md5({_NORM_SQL}) AS fp,
             len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / length(text) AS alpha_ratio,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored WHERE alpha_ratio > 0.55 AND n_tokens >= 5
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM deduped
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → fingerprint-dedup → per-(lang, source) stats."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.length(t).alias("n_chars"),
        F.md5(F.encode(_norm(t), "UTF-8")).alias("fp"),
        (F.regexp_count(t, F.lit("[A-Za-z]")) / F.length(t)).alias("alpha_ratio"),
        n_tokens.alias("n_tokens"),
    )
    quality = scored.filter((F.col("alpha_ratio") > 0.55) & (F.col("n_tokens") >= 5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )
