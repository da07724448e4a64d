"""Continuous CSV ingest of dirty health data — the streaming twin of
the batch ETL (SURVEY §2.9/§7.5: the reference's weekly re-run, made
continuous).

Split of responsibilities, which is exactly how production streams
handle train-time statistics:

- the **stateless expression phase** (name cleaning, numeric repair,
  categorical normalization — stage_rowwise) runs per micro-batch: it
  is a pure projection, so it streams unchanged;
- the **statistics phase** (median fills, IQR caps) needs corpus-level
  aggregates, which a stream cannot compute retroactively. Those come
  from a reference snapshot (the batch silver table) and are applied as
  literals — the stream enriches rows against FROZEN statistics, and a
  periodic batch job refreshes them. This mirrors feature-store
  practice: never recompute training statistics inside the stream.

``foreachBatch`` writes each cleaned micro-batch to the silver parquet
path with idempotent epoch-keyed subdirectories — re-delivered batches
overwrite their own output (exactly-once effect on top of
at-least-once delivery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import null_na_tokens
from ..pipeline import stage_rowwise


def raw_csv_schema(spark: SparkSession, sample_csv: str) -> T.StructType:
    """Streams need an explicit schema; probe it from one representative
    file (driver-side, bounded — the batch reader's encoding probe
    applies here too)."""
    from ..sources.ingest import read_csv_raw

    return read_csv_raw(spark, sample_csv).schema


def read_raw_stream(
    spark: SparkSession, watch_dir: str, schema: T.StructType, encoding: str = "ISO-8859-1"
) -> DataFrame:
    """readStream over a landing directory of raw CSVs (all-string
    schema, NA tokens nulled — the streaming read_csv_raw)."""
    raw = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("encoding", encoding)
        .option("maxFilesPerTrigger", 8)
        .csv(watch_dir)
    )
    return raw.select(
        *[null_na_tokens(F.col(f"`{c}`")).alias(c) for c in raw.columns]
    )


def clean_stream(raw: DataFrame, country_corrections: dict | None = None) -> DataFrame:
    """The stateless cleaning phase applied to the stream — identical
    expressions to the batch pipeline (same codegen'd projection)."""
    return stage_rowwise(raw, country_corrections)


def run_to_parquet(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drive the stream to the silver path via idempotent foreachBatch."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
