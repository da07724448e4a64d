"""Classic TPC-H query shapes over the driver's star schema — the
lingua-franca benchmark queries (Q1/Q3/Q5/Q6/Q10/Q14), adapted only
where the driver's slimmed columns require it (no o_shippriority /
l_shipmode / l_commitdate, so Q3/Q10 drop those output columns and
Q4/Q12 are out of reach).

Why they're here: SURVEY §2 parity covers the reference's own queries;
these six cover the canonical analytic shapes every warehouse engine is
judged on — wide aggregate sweep (Q1), selective join + top-k (Q3),
six-table star join with a cycle-closing predicate (Q5), pure scan-agg
(Q6), join + group + top-k on revenue (Q10), conditional-share
aggregation (Q14). Plans are the scale-right ones: dims broadcast,
facts never reshuffled for them, top-k as TakeOrderedAndProject.

Date literals are chosen inside the generated data's 1995-2001 range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import ROUND_DP, load, query, round_cmp, round_cmp_sql

DP = ROUND_DP


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), {DP}) AS sum_qty,
           ROUND(SUM(l_extendedprice), {DP}) AS sum_base_price,
           {round_cmp_sql("SUM(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
           {round_cmp_sql("SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
           {round_cmp_sql("AVG(l_quantity)")} AS avg_qty,
           {round_cmp_sql("AVG(l_extendedprice)")} AS avg_price,
           {round_cmp_sql("AVG(l_discount)")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical wide-aggregate scan —
    one pass over the fact table, eight aggregates over two low-card
    keys. The 100 TB plan is exactly this one: pushed date filter,
    partial→final HashAggregate to |flag×status| rows, nothing else
    moves."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), DP).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), DP).alias("sum_base_price"),
            round_cmp(F.sum(disc_price)).alias("sum_disc_price"),
            round_cmp(F.sum(charge)).alias("sum_charge"),
            round_cmp(F.avg("l_quantity")).alias("avg_qty"),
            round_cmp(F.avg("l_extendedprice")).alias("avg_price"),
            round_cmp(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {round_cmp_sql("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-03-15'
      AND l.l_shipdate > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: driver orders carry no
    o_shippriority column): top-10 unshipped BUILDING-segment orders by
    revenue. Scale shape: customer filter broadcast into the orders
    join, lineitem joined on orderkey (the one big shuffle — or zero
    bucketed), top-k via TakeOrderedAndProject with full tiebreak."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {round_cmp_sql("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: the six-table star join with the
    cycle-closing predicate (supplier nation == customer nation) that
    turns the star into a flower. Scale shape: nation/region/supplier
    broadcast; customer⋈orders and the lineitem join are the two real
    shuffles; the nation-equality predicate rides the supplier join, so
    no post-join filter pass."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {round_cmp_sql("SUM(l_extendedprice * l_discount)")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: the purest scan-aggregate —
    every predicate pushes into the parquet scan (date range, discount
    band, quantity cap), one partial-agg'd scalar comes back. The query
    whole engines' data-skipping stories are judged on: with the range-
    sorted layout (sources/sorted_layout.py) the date filter prunes
    whole files before a byte of pages is read."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_cmp(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {round_cmp_sql("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue,
           ROUND(ANY_VALUE(c.c_acctbal), {DP}) AS c_acctbal,
           ANY_VALUE(n.n_name) AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-10-01'
      AND o.o_orderdate < DATE '1997-01-01'
      AND l.l_returnflag = 'A'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (adapted: this generator's
    return flag 'A' plays the spec's 'R'; address/phone columns don't
    exist): top-20 customers by revenue lost to returns in a quarter.
    Scale shape: the quarter filter prunes orders FIRST (smallest
    effective fact side), customer+nation broadcast, single groupBy on
    custkey, TakeOrderedAndProject top-20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.round(F.any_value(F.col("c_acctbal")), DP).alias("c_acctbal"),
            F.any_value(F.col("n_name")).alias("n_name"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT {round_cmp_sql(
        "100.0 * SUM(CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END) "
        "/ SUM(l.l_extendedprice * (1 - l.l_discount))"
    )} AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-03-01'
      AND l.l_shipdate < DATE '1996-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (adapted: p_type here is a flat
    category, so equality replaces the spec's LIKE 'PROMO%%'): the share
    of one month's revenue from promo parts — the conditional-share
    aggregation computed in ONE pass (no self-join, no second scan).
    Scale shape: part broadcasts into the month-pruned lineitem scan;
    a single two-accumulator aggregate returns one row."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            round_cmp(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
