"""Data-quality report as assertable DataFrame-returning checks —
the reference's manual QA surface (nb@0:342-404) made programmatic
(SURVEY §5.1 item 3).

``exact=False`` switches the quantile family to the sketch-based
approximations for the 100 TB path (SURVEY §4.3 exactness ladder)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _median(col: str, exact: bool) -> F.Column:
    c = F.col(f"`{col}`")
    return F.median(c) if exact else F.percentile_approx(c, 0.5)


def null_report(df: DataFrame) -> DataFrame:
    """Nulls per column (nb@0:352-360) — one pass, long form."""
    counts = df.select(
        [F.sum(F.col(f"`{c}`").isNull().cast("long")).alias(c) for c in df.columns]
    )
    return counts.unpivot(
        ids=[], values=list(df.columns), variableColumnName="column", valueColumnName="null_count"
    ).orderBy(F.desc("null_count"), "column")


def shape_report(df: DataFrame) -> DataFrame:
    """Row/column counts + exact duplicate count (nb@0:344-350, nb@1:1)."""
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    distinct = df.dropDuplicates().agg(F.count(F.lit(1)).alias("n_distinct"))
    return (
        total.crossJoin(distinct)
        .withColumn("n_duplicates", F.col("n_rows") - F.col("n_distinct"))
        .withColumn("n_columns", F.lit(len(df.columns)))
    )


def key_metric_summary(df: DataFrame, exact: bool = True) -> DataFrame:
    """mean/max/min of mortality & recovery; mean/median of cost
    (nb@0:386-404)."""
    return df.agg(
        F.avg("Mortality_Rate_per_100").alias("mean_mortality"),
        F.max("Mortality_Rate_per_100").alias("max_mortality"),
        F.min("Mortality_Rate_per_100").alias("min_mortality"),
        F.avg("Recovery_Rate").alias("mean_recovery"),
        F.max("Recovery_Rate").alias("max_recovery"),
        F.min("Recovery_Rate").alias("min_recovery"),
        F.avg("Avg_Treatment_Cost_USD").alias("mean_cost"),
        _median("Avg_Treatment_Cost_USD", exact).alias("median_cost"),
    )


def sample_rows(df: DataFrame, n: int = 5, seed: int = 42) -> DataFrame:
    """Deterministic exact-n QA sample (nb@0:370-373; pandas sample is
    exact-n, Spark sample is fraction-based — orderBy(rand)+limit gives
    exact n; quirk Q11: bitwise parity with pandas RNG is a non-goal)."""
    return df.orderBy(F.rand(seed)).limit(n)
