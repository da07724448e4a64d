"""Bucketed tables — pre-shuffled storage for co-located joins.

A join between two large fact tables shuffles BOTH sides on the join
key every time it runs. Bucketing pays that shuffle once at write time:
``bucketBy(n, key)`` hash-partitions rows into fixed bucket files, and
``sortBy(key)`` pre-sorts within each bucket, so a SortMergeJoin between
two tables bucketed the same way needs **no Exchange and no Sort** at
read time — the scan IS the shuffle. At 100 TB this is the difference
between re-shuffling terabytes per query and a partition-local merge.

Bucketing only works through the catalog (``saveAsTable`` — plain
``parquet(path)`` writes lose the bucket spec), so these helpers manage
external tables at an explicit path.

`tests/test_bucketed.py` proves the plan property: the bucketed join
plans zero Exchanges, the unbucketed twin plans two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
