"""Advanced relational shapes a 100 TB pipeline leans on that the
reference never needed: per-group top-k, as-of (last-touch) joins,
banded non-equi joins, and closed-form regression aggregates.

The reference's ML surface (SURVEY §2.10) is sklearn on collected
pandas; ``regr_linear_fit`` is the part of that surface that IS
SQL-expressible — closed-form OLS via the ANSI ``REGR_*`` aggregate
family — so it gets a full DuckDB oracle, unlike the MLlib forest
(property-tested in tests/test_ml.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import ROUND_DP, load, query, round_cmp, round_cmp_sql

DP = ROUND_DP

TOP_K = 2


@query(
    "topk_per_group",
    oracle=f"""
    SELECT l_suppkey, CAST(rnk AS INTEGER) AS rnk, l_orderkey, l_linenumber,
           ROUND(l_extendedprice, {DP}) AS price
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS rnk
      FROM lineitem
    )
    WHERE rnk <= {TOP_K}
    ORDER BY l_suppkey, rnk
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group (top-{TOP_K} priciest lineitems per
    supplier) — the per-group twin of the reference's global
    ``orderBy().limit(n)`` top-k (SURVEY §2.6, e.g. nb@2:4).

    Scale shape: one shuffle on the group key; each partition sorts
    only its own groups (no global sort). Ties broken by explicit
    (orderkey, linenumber) so the row_number is deterministic and
    oracle-comparable. Because the rank filter is `rnk <= k`, Spark
    plans ``WindowGroupLimit`` on BOTH sides of the shuffle (verified
    in the formatted plan): each map task keeps only its local top-k
    per group before shuffling, so shuffle volume is bounded by
    k × groups × partitions regardless of rows-per-group skew.
    """
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "l_suppkey",
            "rnk",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", DP).alias("price"),
        )
        .orderBy("l_suppkey", "rnk")
    )


@query(
    "asof_join_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id,
             CASE WHEN event_type = 'click' THEN ts END AS c_ts
      FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT user_id, ts, event_id, side,
             LAST_VALUE(c_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS UNBOUNDED PRECEDING) AS click_id,
             LAST_VALUE(c_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS UNBOUNDED PRECEDING) AS click_ts
      FROM u
    )
    SELECT user_id, event_id AS purchase_id, click_id,
           CAST(date_diff('microsecond', click_ts, ts) AS BIGINT) AS gap_us
    FROM m
    WHERE side = 1
    ORDER BY user_id, purchase_id
    """,
)
def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it (last-touch attribution) — an operator Spark has no
    built-in for, composed from existing ops (SURVEY task list:
    custom-operator strategy (a)).

    Scale shape: the naive form is an inequality join (quadratic per
    user); instead, union both sides with a marker and take
    ``last(click, ignorenulls)`` over a (ts, side, event_id)-ordered
    per-user window — ONE shuffle on user_id, linear scan per user,
    no join at all. Ties: a click at exactly the purchase ts matches
    (side orders clicks first); among equal-ts clicks the largest
    event_id wins. The oracle runs the identical window program in SQL,
    so the semantics are pinned, not approximated.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("side"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias("c_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = u.select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.last("c_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"),
    )
    return (
        m.filter(F.col("side") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "click_id",
            (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


#: (band, lo, hi) — deliberately irregular widths so the op is a real
#: non-equi join, not a width_bucket projection.
PRICE_BANDS = [
    ("budget", 0.0, 75_000.0),
    ("mid", 75_000.0, 250_000.0),
    ("premium", 250_000.0, 1e18),
]


@query(
    "range_band_join",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), {DP}) AS revenue
    FROM orders o
    JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)})
         AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: facts joined to a tiny interval dimension on
    ``lo <= x < hi`` — the canonical non-equi shape (price tiers, SLA
    buckets, age brackets à la the reference's hand-rolled age columns).

    Scale shape: the band table is rows-countable-on-one-hand, so the
    ONLY sane plan is BroadcastNestedLoopJoin — each fact partition
    scans 3 broadcast rows, no shuffle of the fact side at all. (With
    a large interval table the strategy changes to bucketing both
    sides by a coarsened key; not this operator's regime.)
    """
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), DP).alias("revenue"),
        )
        .orderBy("band")
    )


@query(
    "regr_linear_fit",
    oracle=f"""
    SELECT l_returnflag,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), {DP}) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), {DP}) AS intercept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), {DP}) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def regr_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (price ~ quantity) via the ANSI
    ``REGR_*`` aggregate family — the SQL-expressible slice of the
    reference's ML surface (corr-with-target ranking, nb@26:9, is the
    r=√r2 special case; the full RandomForest lives in ml.py).

    Scale shape: each REGR_* is an algebraic aggregate (sums, squares,
    cross-products) with partial map-side combine — one shuffle of
    |groups| × constant state, whatever the row count. This is why
    closed-form fits beat iterative solvers for screening features at
    100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), DP).alias("slope"),
            F.round(F.regr_intercept(y, x), DP).alias("intercept"),
            F.round(F.regr_r2(y, x), DP).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user event counts, one column per event
    type — the relational shape of the reference's ``get_dummies``
    one-hot encoding (SURVEY §2.7, nb@26:3-6), as a first-class
    operator rather than an ML-only transform.

    Scale shape: the pivot values are DECLARED (not discovered), and
    the op deliberately compiles to conditional aggregation
    (count-if per type) instead of DataFrame ``.pivot()``: Spark's
    pivotfirst plans a two-level aggregation with an extra shuffle,
    while count-if is ONE partial+final hash aggregate — one shuffle
    on user_id, constant per-group state, width fixed at |types|.
    Never pivot on an unbounded-cardinality column; a discovered pivot
    over millions of distinct values is a schema explosion, not a plan.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
                for t in EVENT_TYPES
            ]
        )
        .orderBy("user_id")
    )


MA_WINDOW = 7


@query(
    "window_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderpriority AS priority, o_orderdate AS d,
             SUM(o_totalprice) AS revenue
      FROM orders
      GROUP BY priority, d
    )
    SELECT priority, d,
           ROUND(revenue, {DP}) AS revenue,
           ROUND(AVG(revenue) OVER (
             PARTITION BY priority ORDER BY d
             ROWS BETWEEN {MA_WINDOW - 1} PRECEDING AND CURRENT ROW
           ), {DP}) AS ma{MA_WINDOW}
    FROM daily
    ORDER BY priority, d
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based rolling mean: {MA_WINDOW}-row moving average of
    daily revenue per order priority — the time-series smoothing the
    reference's year-trend query (SURVEY §2.4 mortality trend) grows
    into once time is a real date axis.

    Scale shape: aggregate FIRST (fact rows → |priority|×|days| rows),
    window over the reduced set — the rolling frame never touches fact
    granularity. Catalyst reuses the groupBy's hash partitioning for
    the window's partitionBy when keys align; the frame is O(window)
    per row with a sliding sum, not a per-row rescan.
    """
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("d"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("d")
        .rowsBetween(-(MA_WINDOW - 1), Window.currentRow)
    )
    return daily.select(
        "priority",
        "d",
        F.round("rev", DP).alias("revenue"),
        F.round(F.avg("rev").over(w), DP).alias(f"ma{MA_WINDOW}"),
    ).orderBy("priority", "d")


N_TILES = 4


@query(
    "ntile_quartiles",
    oracle=f"""
    WITH tiled AS (
      SELECT c_mktsegment AS segment, c_acctbal,
             NTILE({N_TILES}) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey
             ) AS quartile
      FROM customer
    )
    SELECT segment, CAST(quartile AS INTEGER) AS quartile,
           COUNT(*) AS n_customers,
           {round_cmp_sql("AVG(c_acctbal)")} AS avg_balance,
           ROUND(MIN(c_acctbal), {DP}) AS lo,
           ROUND(MAX(c_acctbal), {DP}) AS hi
    FROM tiled
    GROUP BY segment, quartile
    ORDER BY segment, quartile
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency banding: NTILE({N_TILES}) of customers by
    account balance within market segment, then per-band summary —
    the windowed cousin of the reference's IQR quantile analysis
    (SURVEY §2.4 iqr_clip) that yields band MEMBERSHIP, not just cut
    points.

    Determinism: NTILE order ties are broken by c_custkey so both
    engines assign identical tiles. Scale shape: one shuffle on
    segment; per-partition sort then a streaming tile assignment.
    For a GLOBAL ntile at 100 TB, switch to approx percentile cut
    points + a bucketing join — a global sort is the wrong plan.
    """
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
        F.ntile(N_TILES).over(w).alias("quartile"),
    )
    return (
        tiled.groupBy("segment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round_cmp(F.avg("c_acctbal")).alias("avg_balance"),
            F.round(F.min("c_acctbal"), DP).alias("lo"),
            F.round(F.max("c_acctbal"), DP).alias("hi"),
        )
        .orderBy("segment", "quartile")
    )


@query(
    "percent_rank_band",
    oracle=f"""
    WITH pr AS (
      SELECT o_orderpriority, o_totalprice,
             PERCENT_RANK() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS pr
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(LEAST(FLOOR(pr * 10), 9) AS INT) AS decile_band,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), {DP}) AS min_price,
           ROUND(MAX(o_totalprice), {DP}) AS max_price
    FROM pr
    GROUP BY o_orderpriority, decile_band
    ORDER BY o_orderpriority, decile_band
    """,
)
def percent_rank_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK decile banding per priority class — the relative-
    standing window family (percent_rank/cume_dist) that complements
    ntile_quartiles: rank-derived, so bands are exact fractions of the
    group regardless of value skew.

    The window ORDER BY carries o_orderkey as the tiebreak: equal
    prices would otherwise get engine-dependent ranks (percent_rank is
    deterministic only over a total order). One shuffle on the
    partition key serves the window sort and the band aggregation.
    """
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    pr = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        pr.groupBy(
            "o_orderpriority",
            F.least(F.floor(F.col("pr") * 10), F.lit(9)).cast("int").alias("decile_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), DP).alias("min_price"),
            F.round(F.max("o_totalprice"), DP).alias("max_price"),
        )
        .orderBy("o_orderpriority", "decile_band")
    )


@query(
    "rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             SUM(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY ROUND(monetary, {DP}) DESC, o_custkey) AS m,
             monetary
      FROM per_cust
    )
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           COUNT(*) AS n_customers,
           {round_cmp_sql("AVG(monetary)")} AS avg_monetary
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency/frequency/monetary quartile
    scores composed into segments, the canonical marketing-analytics
    composite (and a three-metric generalization of ntile_quartiles).

    Scale shape: the per-customer base reduces the orders table on ONE
    shuffle key; the corpus max-date is a 1-row broadcast. The three
    NTILE windows are global (unpartitioned) — fine over |customers|
    score rows after reduction, and at true 100 TB scale the swap is
    percentile_approx thresholds (§4.3) instead of a global sort. Every
    NTILE orders by (metric, custkey): bucket edges split ties
    arbitrarily otherwise, and the two engines WILL split them
    differently. Monetary ranks on the ROUNDED value for the same
    reason (last-ULP sum noise).
    """
    o = load(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    max_date = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("corpus_max"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(max_date))
        .select(
            "o_custkey",
            F.datediff("corpus_max", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = per_cust.select(
        "monetary",
        F.ntile(4).over(Window.orderBy("recency_days", "o_custkey")).alias("r"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "o_custkey")).alias("f"),
        F.ntile(4)
        .over(Window.orderBy(F.desc(F.round("monetary", DP)), "o_custkey"))
        .alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round_cmp(F.avg("monetary")).alias("avg_monetary"),
        )
        .orderBy("r", "f", "m")
    )


@query(
    "brand_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_type, p.p_brand,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, p.p_brand
    )
    SELECT p_type, p_brand,
           ROUND(revenue, {DP}) AS revenue,
           {round_cmp_sql("revenue / SUM(revenue) OVER (PARTITION BY p_type)")}
             AS share_of_type,
           {round_cmp_sql("revenue / SUM(revenue) OVER ()")} AS share_of_total
    FROM rev
    ORDER BY p_type, p_brand
    """,
)
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each brand's revenue as a share of its type and
    of the whole corpus — the reporting window family (share-of-parent)
    that none of the rank/frame windows cover.

    Scale shape: the fact table reduces FIRST (one shuffle keyed by the
    broadcast-joined part dims), and both ratio windows run over the
    |type × brand| aggregate — the unpartitioned total is a window over
    that tiny set, never over line items. round_cmp on the shares: a
    ratio of two group sums inherits summation-order noise from both
    sides.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    from pyspark.sql.window import Window

    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )
    w_type = Window.partitionBy("p_type")
    w_all = Window.partitionBy()
    return rev.select(
        "p_type",
        "p_brand",
        F.round("revenue", DP).alias("revenue"),
        round_cmp(F.col("revenue") / F.sum("revenue").over(w_type)).alias(
            "share_of_type"
        ),
        round_cmp(F.col("revenue") / F.sum("revenue").over(w_all)).alias(
            "share_of_total"
        ),
    ).orderBy("p_type", "p_brand")


#: EWMA smoothing factor
_EWMA_ALPHA = 0.3


@query(
    "ewma_smoothing",
    oracle=f"""
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    w AS (
      SELECT user_id, n,
             value * CASE WHEN rn = 1
                          THEN POWER(1 - {_EWMA_ALPHA}, n - 1)
                          ELSE {_EWMA_ALPHA} * POWER(1 - {_EWMA_ALPHA}, n - rn)
                     END AS wv
      FROM r
    )
    SELECT user_id, ANY_VALUE(n) AS n_events,
           {round_cmp_sql("SUM(wv)")} AS ewma_value
    FROM w GROUP BY user_id ORDER BY user_id
    """,
)
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    — the standard time-series smoother (s_t = α·x_t + (1-α)·s_{t-1})
    whose RECURSIVE definition looks stream-only, computed here in its
    CLOSED FORM: each row's weight α·(1-α)^(n-t) (the first row keeps
    (1-α)^(n-1)) depends only on the row's position, so the whole fold
    becomes window-rank + pow + one grouped sum — set-oriented, no
    sequential state, no UDF.

    Scale shape: ONE shuffle on user_id serves the rank window and the
    final aggregate; per-user work is linear and order-insensitive
    (weights make the sum associative). This is the general trick for
    linear recurrences at scale: solve the recurrence, ship the closed
    form. Both engines' pow() agree within an ulp; round_cmp pins the
    comparison as for any cross-engine float sum.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    a = _EWMA_ALPHA
    wv = F.col("value") * F.when(
        F.col("rn") == 1, F.pow(F.lit(1 - a), F.col("n") - 1)
    ).otherwise(F.lit(a) * F.pow(F.lit(1 - a), F.col("n") - F.col("rn")))
    return (
        r.select("user_id", "n", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.any_value(F.col("n")).alias("n_events"),
            round_cmp(F.sum("wv")).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


#: units to allocate exactly (integer, must sum to exactly this)
_ALLOC_BUDGET = 1_000_000


@query(
    "largest_remainder_alloc",
    oracle=f"""
    WITH c AS (
      SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    ),
    s AS (
      SELECT event_type, cnt,
             {_ALLOC_BUDGET}.0 * cnt / SUM(cnt) OVER () AS exact_share
      FROM c
    ),
    f AS (
      SELECT event_type, cnt,
             CAST(FLOOR(exact_share) AS BIGINT) AS base_units,
             exact_share - FLOOR(exact_share) AS frac,
             SUM(CAST(FLOOR(exact_share) AS BIGINT)) OVER () AS floor_total
      FROM s
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY frac DESC, event_type) AS rk
      FROM f
    )
    SELECT event_type, cnt AS n_events,
           base_units + CASE WHEN rk <= {_ALLOC_BUDGET} - floor_total
                             THEN 1 ELSE 0 END AS alloc_units
    FROM ranked ORDER BY event_type
    """,
)
def largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    budget across groups proportionally so the allocations are whole
    units AND sum to the budget EXACTLY — the rounding-drift killer in
    financial proration, shard sizing, and quota assignment (naive
    round() over- or under-shoots by up to |groups|/2 units).

    Floor every share, then hand the leftover units to the largest
    fractional remainders (group-name tiebreak → fully deterministic,
    which is what lets the oracle replay it). Scale shape: one grouped
    count (partial-agg'd), then windows over the |groups|-row result —
    the windows are global but over group-cardinality data, not rows.
    """
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy()
    s = c.select(
        "event_type",
        "cnt",
        (F.lit(float(_ALLOC_BUDGET)) * F.col("cnt") / F.sum("cnt").over(w_all)).alias(
            "exact_share"
        ),
    )
    f = s.select(
        "event_type",
        "cnt",
        F.floor("exact_share").cast("long").alias("base_units"),
        (F.col("exact_share") - F.floor("exact_share")).alias("frac"),
    ).withColumn("floor_total", F.sum("base_units").over(w_all))
    ranked = f.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("frac"), F.asc("event_type")))
    )
    return ranked.select(
        "event_type",
        F.col("cnt").alias("n_events"),
        (
            F.col("base_units")
            + F.when(F.col("rk") <= _ALLOC_BUDGET - F.col("floor_total"), 1).otherwise(0)
        ).alias("alloc_units"),
    ).orderBy("event_type")


@query(
    "cume_dist_price_bands",
    oracle="""
    WITH cd AS (
      SELECT o_orderpriority,
             CUME_DIST() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice) AS cd
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(CEIL(cd * 10) AS INT) AS decile,
           COUNT(*) AS n_orders
    FROM cd
    GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
)
def cume_dist_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST decile banding per order priority — the last classic
    ranking window next to the ntile/percent_rank/row_number coverage:
    cume_dist is ties-inclusive (every row of a tie group gets the
    group's UPPER cumulative fraction), which is exactly what makes it
    band-stable across engines where percent_rank needs tiebreaks.

    Scale shape: one shuffle on the partition key; per-partition sort,
    no global order; the banded rollup aggregates inside the same
    shuffle's layout. Tie-safety makes the decile assignment
    deterministic even on duplicated prices — no ORDER BY tiebreak
    column needed, unlike every LIMIT query in this repo.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        o.select(
            "o_orderpriority",
            F.ceil(F.cume_dist().over(w) * 10).cast("int").alias("decile"),
        )
        .groupBy("o_orderpriority", "decile")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority", "decile")
    )
