"""Hive-style partitioned layout — directory pruning for selective scans.

``partitionBy(col)`` at write time lays data out as
``path/col=value/part-*.parquet``. A read filtered on the partition
column prunes whole DIRECTORIES at planning time (``PartitionFilters``
in the scan node) — zero I/O for excluded partitions, before row-group
statistics even come into play. At 100 TB this is the first-order
storage decision: the interactive filters the reference applies on
every dashboard query (Year, Country — Health_Jim.py:886-892) become
partition keys, so a one-year slice reads 1/25th of the corpus, not a
full scan with residual filters.

Partition-count discipline (the part that bites at scale):
- partition on LOW-cardinality columns users actually filter by
  (year, date, country) — 10³-10⁵ directories, never a high-cardinality
  key (a directory per user_id is a metastore outage, not a layout);
- combine with bucketing (sources/bucketed.py) for the join key INSIDE
  each partition: pruning handles the WHERE, buckets handle the JOIN.

`tests/test_scale_patterns.py` pins the plan property: the filtered
read shows the predicate under PartitionFilters (not PushedFilters)
and scans only the matching directory's files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Write ``df`` as hive-layout parquet partitioned by ``partition_cols``."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-layout parquet tree; partition columns come back as
    real columns reconstructed from directory names."""
    return spark.read.parquet(path)
