"""Driver-certified 100 TB-path variants of the exact-quantile queries.

Round-1 verdict: the parity-tier quantile queries (``median_fill``,
``iqr_clip``, ``group_quantiles``) use Spark's built-in exact
``percentile``/``median``, whose final aggregation state buffers every
value of the (largest) group — correct, and locally fastest, but a
single-task memory funnel at 100 TB. The distributed-exact alternative
existed (`functions/quantiles.py`) yet was only unit-tested. This module
registers the scale path as first-class queries so the driver's
DuckDB differential certifies it too.

The engine is :func:`grouped_exact_quantiles` — exact interpolated
quantiles with NO driver-side collect and NO per-value aggregation
buffer anywhere in the plan:

1. ``groupBy(key, v).count()``            — the value histogram; shuffle
   carries |distinct| rows, partial-agg'd map-side;
2. ``repartitionByRange(key, v)`` + sort  — a distributed sort of the
   histogram, never of the raw rows;
3. per-(partition, key) subtotals         — a tiny aggregate (≤ P·|keys|
   rows); running offsets over it via a window ordered by partition id;
4. cumulative counts within each (pid, key) + offset → every value's
   global 1-based position range [lo, hi], computed in parallel;
5. the p-quantile's flanking positions k, k+1 are located by conditional
   aggregation (``max(CASE WHEN lo<=k<=hi THEN v END)``) and linearly
   interpolated — all expressions, t = 1 + (n-1)·p, matching pandas
   ``quantile`` / DuckDB ``quantile_cont`` / Spark ``percentile``
   bit-for-bit.

Compare `functions/quantiles.py` (same histogram idea for a single
global column, driver-side interpolation): this one generalizes to
grouped keys and keeps even offsets and interpolation in the plan.

Reference parity: the medians/IQR these certify are
Health_Jim.py:222,293,306,332-347,390-391 (fill values, UI defaults,
outlier clipping) — SURVEY §2.4, §4.3.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.lineage import lineage_cut
from ..functions.rank_math import interp_col, rank_spec_col
from .registry import ROUND_DP, load, query, round_cmp, round_cmp_sql

DP = ROUND_DP


def grouped_exact_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    n_parts: int | None = None,
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per ``keys`` group →
    one row per group with columns ``q_0 .. q_{len(probs)-1}`` (plus the
    keys and ``n``). Nulls ignored; empty groups absent.

    Every stage is histogram-sized or smaller; the widest single-task
    state is one range-partition's slice of the histogram — never a
    whole group, never raw rows.
    """
    if not keys:
        raise ValueError("keys must be non-empty; use a constant column for global")
    P = n_parts or df.sparkSession.sparkContext.defaultParallelism
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, F.col(value_col).cast("double").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    ranged = (
        hist.repartitionByRange(P, *keys, "__v")
        .sortWithinPartitions(*keys, "__v")
        .withColumn("__pid", F.spark_partition_id())
    )
    # the histogram feeds three downstream consumers; cut lineage so it
    # is built once (same device as functions/quantiles.py)
    ranged = lineage_cut(ranged)

    # per-(partition, key) subtotals → running offset of each key's rows
    # that live in earlier range partitions, plus the key's total n.
    # This table is ≤ P·|keys| rows — the windows over it are trivial.
    part = ranged.groupBy("__pid", *keys).agg(F.sum("__cnt").alias("__s"))
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = part.select(
        "__pid",
        *keys,
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__s").over(Window.partitionBy(*keys)).alias("__n"),
    )

    # global [lo, hi] position range of every distinct value, in parallel
    w_cum = (
        Window.partitionBy("__pid", *keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hi = F.sum("__cnt").over(w_cum) + F.col("__off")
    pos = ranged.join(F.broadcast(offs), ["__pid", *keys]).select(
        *keys,
        "__v",
        "__n",
        hi.alias("__hi"),
        (hi - F.col("__cnt") + 1).alias("__lo"),
    )

    # flank-and-interpolate, one conditional aggregate per probe, with
    # the SHARED invariant-6 rank math (functions.rank_math — 0-based
    # position first, symmetric interpolation, frac==0 short-circuit);
    # the group's value at positions k and min(k+1, n) is
    # max(v WHERE lo<=k<=hi) — exactly one distinct value covers any
    # position, so max() is just "the" value.
    n = F.col("__n")
    aggs, finals = [], []
    for i, p in enumerate(probs):
        k_lo, k_hi, _ = rank_spec_col(n, float(p))
        aggs.append(
            F.max(F.when((F.col("__lo") <= k_lo) & (F.col("__hi") >= k_lo), F.col("__v"))).alias(f"__vlo_{i}")
        )
        aggs.append(
            F.max(F.when((F.col("__lo") <= k_hi) & (F.col("__hi") >= k_hi), F.col("__v"))).alias(f"__vhi_{i}")
        )
    grouped = pos.groupBy(*keys, "__n").agg(*aggs)
    for i, p in enumerate(probs):
        _, _, frac = rank_spec_col(F.col("__n"), float(p))
        finals.append(
            interp_col(F.col(f"__vlo_{i}"), F.col(f"__vhi_{i}"), frac).alias(f"q_{i}")
        )
    return grouped.select(*keys, F.col("__n").alias("n"), *finals)


def _melted(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col_name, value) long form — global per-column quantiles become
    grouped quantiles keyed by the column's name, so ALL columns share
    one histogram shuffle instead of one pass each."""
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col_name"), F.col(c).cast("double").alias("v"))
            for c in cols
        ]
    )
    return df.select(F.explode(pairs).alias("p")).select("p.col_name", "p.v")


@query(
    "median_fill_scaled",
    oracle=f"""
    SELECT ROUND(MEDIAN(l_quantity), {DP}) AS med_qty,
           ROUND(MEDIAN(l_extendedprice), {DP}) AS med_price,
           ROUND(MEDIAN(l_discount), {DP}) AS med_discount,
           ROUND(MEDIAN(l_tax), {DP}) AS med_tax
    FROM lineitem
    """,
)
def median_fill_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``median_fill`` (Health_Jim.py:222,293,306,390-391) on the
    distributed-exact path: identical answers to the built-in ``median``
    oracle, but the plan's widest aggregation state is one histogram
    partition — no single-node value buffer anywhere.

    All four columns are melted into (col_name, value) and share one
    histogram shuffle; the final one-row pivot is a 4-row conditional
    aggregate."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out_names = ["med_qty", "med_price", "med_discount", "med_tax"]
    q = grouped_exact_quantiles(_melted(li, cols), ["col_name"], "v", [0.5])
    return q.agg(
        *[
            F.round(F.max(F.when(F.col("col_name") == c, F.col("q_0"))), DP).alias(o)
            for c, o in zip(cols, out_names)
        ]
    )


@query(
    "iqr_clip_scaled",
    oracle=f"""
    WITH q AS (
      SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem
    )
    SELECT COUNT(*) AS n_items,
           {round_cmp_sql("AVG(LEAST(GREATEST(l_extendedprice, q1 - 3 * (q3 - q1)), q3 + 3 * (q3 - q1)))")} AS avg_clipped,
           ROUND(MIN(LEAST(GREATEST(l_extendedprice, q1 - 3 * (q3 - q1)),
                           q3 + 3 * (q3 - q1))), {DP}) AS min_clipped,
           ROUND(MAX(LEAST(GREATEST(l_extendedprice, q1 - 3 * (q3 - q1)),
                           q3 + 3 * (q3 - q1))), {DP}) AS max_clipped
    FROM lineitem, q
    """,
)
def iqr_clip_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``iqr_clip`` (Health_Jim.py:332-347) with the quantile scalars
    computed by the distributed histogram engine instead of a
    ``percentile`` buffer, then broadcast back over the table via the
    same 1-row cross join. End-to-end: no collect, no value buffer."""
    li = load(spark, sf_dir, "lineitem")
    q = (
        grouped_exact_quantiles(
            li.select(F.lit("price").alias("g"), F.col("l_extendedprice")),
            ["g"],
            "l_extendedprice",
            [0.25, 0.75],
        )
        .select(F.col("q_0").alias("q1"), F.col("q_1").alias("q3"))
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("q1") - 3 * (F.col("q3") - F.col("q1"))),
        F.col("q3") + 3 * (F.col("q3") - F.col("q1")),
    )
    return li.crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).alias("n_items"),
        round_cmp(F.avg(clipped)).alias("avg_clipped"),
        F.round(F.min(clipped), DP).alias("min_clipped"),
        F.round(F.max(clipped), DP).alias("max_clipped"),
    )


@query(
    "group_quantiles_scaled",
    oracle=f"""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), {DP}) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), {DP}) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), {DP}) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.95), {DP}) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def group_quantiles_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``group_quantiles`` on the distributed-exact path: per-group
    p25/p50/p75/p95 where no aggregation state ever holds a group's
    values — the built-in per-group ``percentile`` buffer is bounded by
    the largest group (fatal when one country is 40% of 100 TB); this
    plan is bounded by one range partition of the value HISTOGRAM."""
    li = load(spark, sf_dir, "lineitem")
    probs = [0.25, 0.50, 0.75, 0.95]
    q = grouped_exact_quantiles(li, ["l_returnflag"], "l_extendedprice", probs)
    return q.select(
        "l_returnflag",
        *[F.round(F.col(f"q_{i}"), DP).alias(f"p{int(p * 100)}") for i, p in enumerate(probs)],
    ).orderBy("l_returnflag")
