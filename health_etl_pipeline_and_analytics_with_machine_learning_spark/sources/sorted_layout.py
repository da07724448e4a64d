"""Range-sorted parquet layout — min/max pruning for high-cardinality
filter columns.

Hive partitioning (sources/partitioned.py) prunes directories for
LOW-cardinality keys. For a high-cardinality filter column (timestamp,
numeric id) the same effect comes from DATA ORDER: `repartitionByRange`
assigns each output file a disjoint value range and
`sortWithinPartitions` orders rows inside, so every parquet
footer/row-group carries tight, non-overlapping min/max statistics. A
selective filter then skips whole files and row groups at scan time —
the poor-man's (single-column) z-order, and the reason "sort your fact
table by its hottest filter column before writing" is standing advice
at 100 TB.

Cost model: one range shuffle at write time (sampled range boundaries,
even output sizes) buys every future scan's pruning — the classic
write-once/read-many trade. The sort inside each file also improves
parquet encoding (delta/RLE on sorted runs), typically shrinking the
files themselves.

The test pins the layout property from the parquet FOOTERS via pyarrow:
per-file [min, max] intervals of the sort column must be pairwise
disjoint — which is exactly what makes a point/range scan touch
O(selectivity) files instead of all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, n_files: int
) -> str:
    """Write parquet with disjoint per-file ranges of ``sort_col``."""
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def file_column_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` read from parquet footer statistics
    only — no data pages touched (what a scan's pruning phase does)."""
    import glob

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        ranges.append((lo, hi))
    return ranges
