"""Classic TPC-H query shapes over the driver's star schema — all
twenty-two of the lingua-franca benchmark queries, adapted where the
driver's slimmed columns require it (no o_shippriority / l_shipmode /
l_commitdate / partsupp; ``lineitem``'s (l_partkey, l_suppkey) pairs
stand in for partsupp, l_returnflag='A' stands in for "late", and
adapted predicates are calibrated non-empty at sf0.001 and sf0.01).

Why they're here: SURVEY §2 parity covers the reference's own queries;
these cover the canonical analytic shapes every warehouse engine is
judged on — wide aggregate sweep (Q1), correlated scalar-subquery MIN
(Q2), selective join + top-k (Q3), EXISTS semi join (Q4), six-table
star with a cycle-closing predicate (Q5), pure scan-agg (Q6),
disjunctive bilateral join (Q7), double-role dimension (Q8), LIKE
filter + profit rollup (Q9), join + group + top-k (Q10), HAVING vs a
global scalar-subquery share (Q11), CASE-pivot counts (Q12), left-join
histogram (Q13), conditional share (Q14), view + scalar subquery
(Q15), NOT IN + distinct-count (Q16), decorrelated correlated
subquery (Q17), IN-aggregate semi join (Q18), OR-of-ANDs spanning
both join sides (Q19), nested IN chain with a correlated threshold
(Q20), the multi-EXISTS/NOT-EXISTS anti-join stress test (Q21), and
NOT EXISTS over above-average keys (Q22). Plans are the scale-right
ones: dims broadcast, facts never reshuffled for them, subqueries
decorrelated to broadcast/semi/anti joins, top-k as
TakeOrderedAndProject.

Date literals are chosen inside the generated data's 1995-2001 range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import lineage_cut
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
    category, so equality replaces the spec's LIKE 'PROMO%'): the share
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


@query(
    "tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           {round_cmp_sql("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
        OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: bilateral trade between two nations per
    year — the disjunctive two-sided nation predicate over a five-join
    tree (pair NATION_18/NATION_19 — calibrated non-empty at sf0.001,
    sf0.01 AND sf0.1: 23/68/621 qualifying rows; the original
    NATION_1/NATION_2 pair was empty at sf0.001, caught by the r17
    suite-wide cross-SF certification). Scale shape: both nation
    sides, supplier, and customer
    broadcast; lineitem⋈orders is the single big shuffle; the
    disjunction evaluates post-join on broadcast columns (cheap), while
    the date range pushes into the fact scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
        "n_nationkey", "sn_key"
    )
    cn = n.withColumnRenamed("n_name", "cust_nation").withColumnRenamed(
        "n_nationkey", "cn_key"
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (adapted: the spec's
    comment-LIKE exclusion becomes an order-priority exclusion — same
    shape, a predicate INSIDE the left join's ON clause so zero-order
    customers survive with count 0). Scale shape: the left outer join
    shuffles on custkey once (or zero bucketed); both aggregations are
    partial-then-final; the histogram is |distinct counts| rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {round_cmp_sql("SUM(l_extendedprice * (1 - l_discount))")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the view-plus-scalar-subquery shape —
    quarterly revenue per supplier, keep the max earner(s). Scale
    shape: one partial-agg'd shuffle builds the |suppliers|-row revenue
    table; the max is a broadcast scalar joined back (no window over a
    global sort, no second scan of lineitem — the revenue table is
    lineage-cut once for both the max and the filter, policy in
    functions.lineage.lineage_cut)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("total_revenue")
        )
    )
    revenue = lineage_cut(revenue)
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17",
    oracle=f"""
    SELECT {round_cmp_sql("SUM(l.l_extendedprice) / 7.0", 2)} AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (adapted: no p_container
    column, brand filter only): lineitems far below their part's average
    order quantity. The correlated subquery decorrelates into a
    per-part average aggregate joined back — the textbook rewrite, and
    the one Catalyst performs; here it's explicit so the plan is
    deterministic. Scale shape: the per-part averages are |parts| rows
    (broadcast); the fact table is scanned once per side of the
    decorrelation, both scans pruned to 3 columns."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_cap")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cap"))
        .agg(
            round_cmp(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q18_QTY = 300


@query(
    "tpch_q18",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, {DP}) AS o_totalprice,
           ROUND(SUM(l.l_quantity), {DP}) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY})
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds {_Q18_QTY} (99th-percentile threshold for this generator).
    The IN-subquery is a semi join against a HAVING aggregate — the big
    keys list is tiny by construction, so it broadcasts into the
    orders⋈lineitem tree instead of a second shuffle. Top-100 via
    TakeOrderedAndProject with full tiebreak."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big).withColumnRenamed("l_orderkey", "__bk"),
                li.l_orderkey == F.col("__bk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", DP).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), DP).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {round_cmp_sql("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted: no container/shipmode
    columns — the three disjunctive brand×size×quantity branches remain,
    which is the point of the query): an OR-of-ANDs predicate spanning
    BOTH join sides. Scale shape: part broadcasts; the disjunction
    can't push into either scan whole, but each side's derivable bounds
    (quantity ≤ 30, size ≤ 35) do — the remainder evaluates post-join
    in one codegen'd stage, no union-of-three-joins blowup."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            round_cmp(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q8",
    oracle=f"""
    WITH flat AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    )
    SELECT o_year,
           {round_cmp_sql(
               "SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)"
               " / SUM(volume)", 6)} AS mkt_share,
           COUNT(*) AS n_lines
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share (adapted: flat p_type equality,
    NATION_3 as the subject nation): the deepest join tree in the suite
    — eight tables, nation joined TWICE under different roles. Scale
    shape: every dimension side broadcasts (nation twice under two
    aliases); lineitem⋈orders is the one big shuffle; the share is a
    conditional-sum ratio in the same aggregate, no second pass."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    cn = (
        n.withColumnRenamed("n_nationkey", "cn_key")
        .withColumnRenamed("n_name", "cust_nation")
        .withColumnRenamed("n_regionkey", "cn_region")
    )
    sn = (
        n.withColumnRenamed("n_nationkey", "sn_key")
        .withColumnRenamed("n_name", "supp_nation")
        .drop("n_regionkey")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            round_cmp(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


_Q22_LAPSE = "1999-01-01"


@query(
    "tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), {DP}) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '{_Q22_LAPSE}')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: market segment
    replaces the phone country code, and "never ordered" becomes
    "lapsed since {_Q22_LAPSE}" — every customer here has SOME order):
    above-average-balance customers with no recent orders, per segment.
    Scale shape: the positive-balance average is one scalar broadcast;
    the recency check is a LEFT ANTI join against the date-pruned
    orders scan (never DISTINCT-after-join); one small aggregate out."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= _Q22_LAPSE)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__ab"))
    lapsed = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        lapsed.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), DP).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "tpch_q2",
    oracle=f"""
    WITH sc AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS scost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    rsc AS (
      SELECT sc.l_partkey, sc.scost, s.s_name, s.s_acctbal, n.n_name
      FROM sc
      JOIN supplier s ON s.s_suppkey = sc.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT ROUND(rsc.s_acctbal, {DP}) AS s_acctbal, rsc.s_name, rsc.n_name,
           p.p_partkey, p.p_name,
           {round_cmp_sql("rsc.scost")} AS supply_cost
    FROM part p JOIN rsc ON rsc.l_partkey = p.p_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
      AND rsc.scost = (
        SELECT MIN(r2.scost) FROM rsc r2 WHERE r2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp table, so
    lineitem's (l_partkey, l_suppkey) pairs play the part-supplier
    relation with MIN unit price as the supply cost; flat p_type
    equality and a size cap replace the spec's LIKE '%BRASS' / size
    filters): for each small STANDARD part, the ASIA supplier(s)
    offering it at the region-minimum cost — the correlated
    scalar-subquery-MIN shape. The subquery decorrelates into a
    per-part MIN aggregate joined back (the rewrite Catalyst itself
    performs on the EXISTS form; explicit here so the plan is
    deterministic). The cost is a MIN over identical per-row doubles —
    no accumulation — so the min-equality join is FP-exact on both
    engines. Scale shape: BOTH dimension filters push through the
    aggregate as broadcast SEMI joins on the fact scan — only
    qualifying parts can reach the output and only region suppliers
    participate in the correlated min, so pruning lineitem to
    (qualifying part x ASIA supplier) rows BEFORE the pair aggregate
    is semantics-preserving and shrinks the one fact shuffle by the
    product of both selectivities (~0.20 x ~0.03 here — the r16
    follow-up that took the op from 1.19 s to the sub-second band at
    sf0.1, and the difference between shuffling 100 TB and shuffling
    ~600 GB at scale); the pair cost table then partial-aggregates,
    dims broadcast back on, the per-part minima are ≤|parts| rows
    (dimension-bounded) and computed as a MIN WINDOW over the pair
    table — one linear plan, so the fact scan runs ONCE (a min
    aggregate joined back would reference the pair subtree twice, and
    Catalyst does not dedupe shared subplans — the r5b gotcha; the
    window's partkey shuffle is over the dimension-bounded pair table,
    never the fact); top-100 is TakeOrderedAndProject over the full
    (acctbal, nation, name, part) tiebreak."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li_pruned = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi"
    ).join(
        F.broadcast(asia.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    sc = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("scost")
    )
    rsc = (
        sc.join(F.broadcast(asia), sc.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "scost", "s_name", "s_acctbal", "n_name",
                "p_partkey", "p_name")
    )
    mn = F.min("scost").over(Window.partitionBy("l_partkey"))
    return (
        rsc.withColumn("__mn", mn)
        .filter(F.col("scost") == F.col("__mn"))
        .select(
            F.round("s_acctbal", DP).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            round_cmp(F.col("scost")).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'A')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: no l_commitdate /
    l_receiptdate, so "a late lineitem exists" becomes "a returned
    lineitem exists" — l_returnflag='A', the same stand-in q10 uses):
    one quarter's orders that contain at least one problem line,
    counted by priority. The EXISTS is a LEFT SEMI join — each order
    counts ONCE however many lines match (never an inner-join +
    DISTINCT, which would shuffle the multiplicity just to throw it
    away). Scale shape: the quarter filter prunes the orders scan; the
    semi join shuffles both sides on orderkey (co-partitioned — AQE
    can reuse the exchange); the priority rollup is 5 rows."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "A"
    ).select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {round_cmp_sql(
               "SUM(l.l_extendedprice * (1 - l.l_discount)"
               " - 3.0 * p.p_retailprice * l.l_quantity)"
           )} AS sum_profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no ps_supplycost, so the
    unit cost proxy is 3.0 x p_retailprice — calibrated below the
    ~4.8k mean unit sale price so profit stays sign-mixed-realistic;
    the spec's p_name LIKE filter survives verbatim): profit by
    supplier nation by order year over one product family. Scale
    shape: the LIKE-filtered part dim broadcasts INTO the fact scan
    (the filter prunes ~87% of lineitem before anything wide);
    supplier and nation broadcast; lineitem x orders is the one big
    shuffle; the rollup is |nations x years| rows."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(3.0) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            round_cmp(F.sum(amount)).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, SUM(l.l_extendedprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    ),
    thr AS (
      SELECT {round_cmp_sql("1.5 * SUM(value) / COUNT(*)")} AS t FROM val
    )
    SELECT val.l_partkey AS p_partkey,
           {round_cmp_sql("val.value")} AS part_value
    FROM val, thr
    WHERE {round_cmp_sql("val.value")} > thr.t
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: no partsupp, so a part's
    "value" held by ASIA-region suppliers is its summed extended price
    from their lineitems; the spec's fixed 0.0001/SF share threshold
    becomes 1.5x the mean per-part value, which self-scales with SF):
    parts whose regional value exceeds the global-share threshold —
    the HAVING-vs-scalar-subquery shape. Both the per-part value and
    the threshold snap to the certified 4dp grid (round_cmp) BEFORE
    the comparison, so the cross-engine float-sum ordering difference
    can never flip a boundary row. Scale shape: supplier/nation/region
    broadcast into the fact scan; ONE partial-aggregated shuffle on
    partkey builds the |parts|-bounded value table (lineage-cut — it
    feeds both the threshold scalar and the filter, and Catalyst does
    not dedupe shared subplans; policy in
    functions.lineage.lineage_cut); the threshold is a 1-row
    broadcast."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    val = lineage_cut(val)
    thr = val.agg(
        round_cmp(F.lit(1.5) * F.sum("value") / F.count(F.lit(1))).alias("__t")
    )
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(round_cmp(F.col("value")) > F.col("__t"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_cmp(F.col("value")).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority pivot (adapted: no l_shipmode,
    so l_returnflag plays the mode — the spec's two-mode IN filter and
    the urgent/non-urgent CASE pivot survive verbatim): one year's
    problem lines classified by flag, counting high- vs low-priority
    orders in the SAME aggregate pass (two conditional counters, one
    scan — never a pivot shuffle or a second join). Scale shape: the
    flag + year filters push into the fact scan; lineitem x orders is
    the one shuffle; the result is 2 rows."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: flat p_type
    inequality for the spec's NOT LIKE, and "suppliers with complaints"
    becomes suppliers with s_acctbal < 1000 — the bottom ~15%): how
    many distinct qualifying suppliers ship each (brand, type, size)
    bucket, excluding the complaint list. The NOT IN is a LEFT ANTI
    join — sound here because s_suppkey is a non-null key column (the
    NOT-IN-vs-NULL trap documented, not tripped). Scale shape: the
    complaint list is supplier-dimension-bounded and broadcasts as the
    anti side; the part filter broadcasts; COUNT(DISTINCT) expands in
    the single partial-aggregated shuffle on the group key; sort is
    |buckets| rows."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    compl = s.filter(F.col("s_acctbal") < 1000.0).select("s_suppkey")
    return (
        li.join(F.broadcast(compl), li.l_suppkey == compl.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20",
    oracle=f"""
    SELECT s.s_name, ROUND(s.s_acctbal, {DP}) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT ps.l_suppkey
        FROM (SELECT l_partkey, l_suppkey, SUM(l_quantity) AS avail
              FROM lineitem GROUP BY l_partkey, l_suppkey) ps
        WHERE ps.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
          AND ps.avail > 4.0 * (
            SELECT COALESCE(SUM(l2.l_quantity), 0)
            FROM lineitem l2
            WHERE l2.l_partkey = ps.l_partkey
              AND l2.l_suppkey = ps.l_suppkey
              AND l2.l_shipdate >= DATE '1997-01-01'
              AND l2.l_shipdate < DATE '1998-01-01'))
    ORDER BY s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: no partsupp, so a
    pair's "available quantity" is its all-time shipped total and the
    spec's half-of-one-year threshold becomes 4x the 1997 shipment —
    pairs whose recent demand collapsed relative to history): ASIA
    suppliers holding excess stock of a LIKE-filtered part family —
    the nested IN chain (supplier IN pairs IN parts) with a CORRELATED
    scalar-subquery threshold. The correlated subquery decorrelates
    into a conditional sum in the SAME aggregate pass (avail and the
    1997 window sum come out of one shuffle — the textbook rewrite,
    explicit so the plan is deterministic); quantities are integral
    doubles, so the 4x comparison is FP-exact on both engines. Scale
    shape: the part IN-list broadcasts as a semi join PRUNING the fact
    scan before the pair aggregate; the qualifying-supplier list is
    supplier-dimension-bounded and broadcasts as the final semi side;
    result ordered by the unique supplier name."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    wp = load(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    in_1997 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    ps = (
        li.join(F.broadcast(wp), li.l_partkey == wp.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("avail"),
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
                "recent"
            ),
        )
    )
    cand = (
        ps.filter(F.col("avail") > F.lit(4.0) * F.col("recent"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(cand), s.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", DP).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'A'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'A')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted: no
    l_commitdate / l_receiptdate, so "late" is l_returnflag='A' — the
    same stand-in as q4/q10): ASIA suppliers that were the SOLE
    problem supplier on a finished multi-supplier order — the
    canonical multi-EXISTS/NOT-EXISTS decorrelation stress test. Both
    correlated subqueries carry the suppkey INEQUALITY correlation, so
    they decorrelate to a LEFT SEMI and a LEFT ANTI self-join on
    orderkey with the inequality as a residual condition (never a
    DISTINCT-rewrite, never a cartesian). Scale shape: the ASIA
    supplier dim broadcasts FIRST, shrinking l1 to ~flag/region
    selectivity before anything wide; the orders-status check is
    another semi join; all three orderkey joins are co-partitioned
    (one exchange of each lineitem projection, AQE-reusable); top-100
    via TakeOrderedAndProject on (numwait DESC, name).

    A/B'd against the other textbook decorrelation — one per-order
    stats pass (countDistinct suppliers >= 2 AND countDistinct late
    suppliers == 1) joined back — at sf0.1: identical results, but the
    stats variant ran ~1.4x SLOWER (1.60 vs 1.11 s min-of-4; the
    two countDistincts expand every lineitem row 2x through an Expand
    node, costing more than the semi+anti's extra orderkey exchange),
    so the canonical join form is also the measured winner here."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    o_f = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "A")
        .select("l_orderkey", "l_suppkey")
        .join(F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__k2"), F.col("l_suppkey").alias("__s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("__k3"), F.col("l_suppkey").alias("__s3")
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("__k2"))
        & (F.col("l_suppkey") != F.col("__s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("__k3"))
        & (F.col("l_suppkey") != F.col("__s3")),
        "left_anti",
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
