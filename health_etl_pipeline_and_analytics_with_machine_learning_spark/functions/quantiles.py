"""Distributed EXACT quantiles — the scale path for the reference's
exact medians/IQR (SURVEY §4.3).

Spark's built-in exact ``percentile`` aggregate buffers every value (as
a value→count map) inside one final aggregation state — correct, but a
single-node memory funnel: at 100 TB it OOMs the task that merges the
buffers. ``percentile_approx`` fixes memory but changes answers, which
the parity tier can't accept.

This module computes exact interpolated quantiles with only
scale-proof primitives:

1. ``groupBy(value).count()``       — shuffle of |distinct| rows, partial-agg'd;
2. ``repartitionByRange(value)``    + sort within partitions — a distributed
   sort of the (value, count) histogram, never of the raw rows;
3. per-partition count totals       — tiny collect (one row per partition),
   prefix-summed on the driver into partition offsets (the same
   two-phase pattern as operators/record_id.py mode='scaled');
4. pid-partitioned cumulative sums  + offset → each value's global
   1-based position range, computed in parallel (window is partitioned
   by pid — no global funnel);
5. one distributed filter pulls the ≤ 2·|probs| boundary values; linear
   interpolation happens on the driver.

Interpolation matches pandas ``quantile``, DuckDB ``quantile_cont`` and
Spark ``percentile``: target position 1 + (n-1)·p, linear between the
flanking values — so results are bit-comparable with the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_quantiles(
    df: DataFrame, value_col: str, probs: Sequence[float]
) -> list[float]:
    """Exact interpolated quantiles of ``value_col`` (nulls ignored),
    computed without any single-node value buffer."""
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # session parallelism, not counts.rdd.getNumPartitions() — the RDD
    # property forces a DataFrame→RDD conversion just to read an int
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        counts.repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
    )
    # lineage is cut so the histogram is built once, not once per pass
    ranged = ranged.localCheckpoint(eager=False)

    per_part = dict(
        ranged.groupBy("__pid").agg(F.sum("cnt").alias("s")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(per_part):
        offsets[pid] = acc
        acc += per_part[pid]
    n = acc
    if n == 0:
        return [float("nan")] * len(probs)

    # offsets reach the rows via a broadcast join on __pid — constant
    # expression depth at any partition count (a chained CASE WHEN per
    # partition would be O(#partitions) deep; same pattern as the
    # sequence-packing prefix offsets in operators/prep.py)
    off_df = df.sparkSession.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "__pid int, __off long",
    )
    w = Window.partitionBy("__pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pos = ranged.join(F.broadcast(off_df), "__pid").select(
        "v",
        (F.sum("cnt").over(w) + F.col("__off")).alias("hi"),  # last global pos of v
        (F.sum("cnt").over(w) + F.col("__off") - F.col("cnt") + 1).alias("lo"),
    )

    # global 1-based positions whose values the interpolation needs
    targets: set[int] = set()
    specs = []
    for p in probs:
        t = 1 + (n - 1) * p
        lo_k, hi_k = int(t), min(int(t) + 1, n)
        frac = t - int(t)
        specs.append((lo_k, hi_k, frac))
        targets.update((lo_k, hi_k))

    cond = None
    for k in targets:
        c = (F.col("lo") <= k) & (F.col("hi") >= k)
        cond = c if cond is None else (cond | c)
    boundary = pos.filter(cond).select("v", "lo", "hi").collect()

    def value_at(k: int) -> float:
        for r in boundary:
            if r.lo <= k <= r.hi:
                return float(r.v)
        raise AssertionError(f"position {k} not covered")

    return [
        value_at(lo_k) + frac * (value_at(hi_k) - value_at(lo_k))
        for lo_k, hi_k, frac in specs
    ]
