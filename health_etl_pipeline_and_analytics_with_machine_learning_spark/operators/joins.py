"""Multi-table join shapes over the star schema.

The reference is a single-table system (SURVEY §2.3: zero joins), but a
complete engine — and any 100 TB training-data pipeline — lives on
joins. These cover the canonical shapes with the plans that survive
scale: dimension tables broadcast, fact tables never reshuffled for
them; existence checks as semi/anti joins (never DISTINCT after an
inner join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import ROUND_DP, load, query, round_cmp, round_cmp_sql, spread

DP = ROUND_DP


@query(
    "star_join_revenue",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), {DP}) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY region, nation
    ORDER BY region, nation
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim ⋈ dim ⋈ dim star join: revenue per nation/region.

    Scale shape: nation and region are broadcast outright; customer is
    dimension-sized relative to orders (broadcast at these SFs, and at
    100 TB the orders⋈customer equi-join is the ONE shuffle — or zero,
    if both are bucketed on custkey; sources/bucketed.py). The fact
    table is scanned once, aggregated with partial combine to
    |nation| rows.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), DP).alias("revenue"),
        )
        .orderBy("region", "nation")
    )


HIGH_VALUE = 300_000


@query(
    "anti_join_inactive_customers",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_without_high_value
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {HIGH_VALUE}
    )
    GROUP BY segment
    ORDER BY segment
    """,
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order, per market segment — LEFT
    ANTI join with a pushed probe-side predicate.

    Scale shape: the existence probe needs only (o_custkey,
    o_totalprice) and its filter pushes to the fact scan; anti join
    avoids the join-then-distinct blowup entirely. At 100 TB the probe
    side can be pre-aggregated to distinct qualifying keys (identical
    result, smaller shuffle).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > HIGH_VALUE)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_without_high_value"))
        .orderBy("segment")
    )


@query(
    "rollup_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), {DP}) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: (status, priority) → (status) → grand total
    in ONE pass — Expand feeds each input row to every grouping set, so
    the fact table is scanned once, not once per level (what the
    reference's two_level_agg re-aggregation approximates by hand).

    The driver tables have no NULL group keys, so COALESCE('ALL')
    disambiguates subtotal rows identically in both engines.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), DP).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@query(
    "cube_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), {DP}) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all four grouping sets — (status, priority),
    (status), (priority), () — in ONE Expand pass over the fact table.
    Unlike ROLLUP it includes the priority-only marginal, so a
    dashboard's "by status", "by priority", and grand-total cards come
    from a single scan and a single shuffle.

    GROUPING() markers distinguish a real NULL key from a subtotal row
    — the ANSI-standard disambiguator (cast to BIGINT so both engines
    agree on the type).
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), DP).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@query(
    "window_lag_value_delta",
    oracle=f"""
    WITH d AS (
      SELECT user_id, ts, event_id, value,
             value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS delta
      FROM events
    )
    SELECT user_id,
           COUNT(delta) AS n_deltas,
           {round_cmp_sql("AVG(delta)")} AS avg_delta,
           ROUND(MAX(ABS(delta)), {DP}) AS max_abs_delta
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value deltas via lag() — the time-series analytic window
    family (lag/lead) the reference's GROUP-BY-Year trend analysis
    approximates.

    Scale shape: ONE shuffle on user_id serves the window sort AND the
    final aggregation (Catalyst reuses the child partitioning); per-user
    state is bounded by per-user event counts.
    """
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (F.col("value") - F.lag("value").over(w)).alias("delta")
    return (
        ev.select("user_id", delta)
        .groupBy("user_id")
        .agg(
            F.count("delta").alias("n_deltas"),
            round_cmp(F.avg("delta")).alias("avg_delta"),
            F.round(F.max(F.abs(F.col("delta"))), DP).alias("max_abs_delta"),
        )
        .orderBy("user_id")
    )


#: bloom geometry: 2^16 bits = 1024 longs; k=2 hashes. With ~2-6k keys
#: at sf0.01-0.1 the false-positive rate is ~1-5% — enough to show the
#: prune without inflating the broadcast.
_BLOOM_BITS = 1 << 16
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (17, 89)
_HIGH_VALUE = 450_000.0


@query(
    "bloom_filter_semi_join",
    oracle=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_items,
           ROUND(SUM(l.l_extendedprice), {DP}) AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_totalprice > {_HIGH_VALUE}
    )
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def bloom_filter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a hand-built bloom pre-filter: lineitems of
    high-value orders, where a compact bitset prunes the fact scan
    BEFORE the exact join removes the bloom's false positives.

    The bloom is pure Catalyst expressions (Spark's own
    ``bloom_filter_agg`` is optimizer-internal, not user-callable):
    build — each build-side key sets k={len(_BLOOM_SEEDS)} bit positions
    ``pmod(xxhash64(key, seed), {_BLOOM_BITS})``; positions fold into
    {_BLOOM_WORDS} longs via a DISTRIBUTED per-word ``bit_or`` aggregate
    (map-side partials), assembled into the dense word array with O(1)
    map lookups. Probe — one ``element_at`` + bit test per hash: O(1)
    per row, no array scan.

    Why it matters at 100 TB: when the build side is too big to
    broadcast AS ROWS, the join becomes a sort-merge that shuffles the
    ENTIRE fact table — but an 8 KB bitset still broadcasts. Probing
    upstream of the Exchange drops ~97% of fact rows before they are
    hashed, shuffled, or spilled; the exact semi join afterwards only
    pays for survivors. Same contract as Catalyst's InjectRuntimeFilter
    (which declines to fire at local scale), expressed by hand. The
    oracle is the plain IN-subquery — the bloom must be semantically
    invisible.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _HIGH_VALUE)
    keys = o.select(F.col("o_orderkey").alias("k"))

    pos_cols = [
        F.pmod(F.xxhash64(F.col("k"), F.lit(seed)), F.lit(_BLOOM_BITS))
        for seed in _BLOOM_SEEDS
    ]
    positions = keys.select(F.explode(F.array(*pos_cols)).alias("pos"))
    # fold bit positions into words via a DISTRIBUTED bit_or aggregate
    # (map-side partials, |words| rows shuffled), then assemble the
    # dense word array with O(1) map lookups — the earlier per-word
    # array-filter fold cost O(words × |positions|) in one expression
    words = positions.groupBy(
        (F.col("pos") / 64).cast("int").alias("w")
    ).agg(
        # SQL form: python F.shiftleft only takes a literal shift amount
        F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias("m")
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {_BLOOM_WORDS - 1}),"
            f" w -> coalesce(element_at(wm, w), 0L))"
        ).alias("bf")
    )

    def probe(seed: int):
        # SQL form: python F.shiftleft only takes a literal shift amount
        return F.expr(
            f"""(element_at(bf, CAST(pmod(xxhash64(l_orderkey, {seed}), {_BLOOM_BITS}) / 64 AS INT) + 1)
                 & shiftleft(1L, CAST(pmod(xxhash64(l_orderkey, {seed}), {_BLOOM_BITS}) % 64 AS INT))) != 0"""
        )

    # the testdata ships one parquet split, so the narrow probe chain
    # (2× xxhash64 + bit test per row) would run on ONE task; spread()
    # self-disables once the fact table has natural splits — the probe
    # still runs upstream of any join exchange.
    li = spread(li, "l_orderkey", n=min(8, spark.sparkContext.defaultParallelism))
    pruned = (
        li.crossJoin(F.broadcast(bloom))
        .filter(probe(_BLOOM_SEEDS[0]) & probe(_BLOOM_SEEDS[1]))
        .drop("bf")
    )
    exact = pruned.join(
        F.broadcast(o.select("o_orderkey")),
        pruned.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), DP).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "grouping_sets_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), {DP}) AS revenue,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
             o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the free-form sibling of rollup/cube
    (operators/joins.py rollup_status_priority, cube_status_priority):
    per-status totals, per-priority totals, and the grand total in ONE
    pass, skipping the (status, priority) cross cells a CUBE would also
    compute.

    Physical shape: a single Expand duplicates each input row once per
    grouping set (3× here) BEFORE one partial→final hash aggregate — one
    scan, one shuffle, |sets|·|groups| result rows. GROUPING() markers
    disambiguate "NULL because aggregated away" from a genuinely null
    key, and give the deterministic sort the oracle needs.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), {DP}) AS revenue,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
        """
    )


_RANK_TOP = 3


@query(
    "supplier_revenue_rank",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey, SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
      FROM lineitem l GROUP BY l.l_suppkey
    ),
    ranked AS (
      SELECT n.n_name AS nation, s.s_name, rev.revenue,
             DENSE_RANK() OVER (
               PARTITION BY n.n_name
               ORDER BY ROUND(rev.revenue, {DP}) DESC, s.s_suppkey) AS rnk
      FROM rev
      JOIN supplier s ON rev.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    )
    SELECT nation, s_name, ROUND(revenue, {DP}) AS revenue,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_RANK_TOP}
    ORDER BY nation, rnk, s_name
    """,
)
def supplier_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_RANK_TOP} suppliers by discounted revenue within each
    nation — the dense_rank leaderboard shape (TPC-H Q15's revenue view
    + per-group ranking), joining fact → supplier → nation.

    Scale shape: revenue reduces the fact table FIRST (one shuffle on
    l_suppkey, partial-agg'd), so the joins see |suppliers| rows, not
    line items — both dims broadcast. The rank window partitions by
    nation over that reduced set, and the rnk filter plans
    WindowGroupLimit. Ranking on the ROUNDED revenue with a suppkey
    tiebreak keeps rank assignment identical in both engines even at
    last-ULP float divergence.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    from pyspark.sql.window import Window

    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    w = Window.partitionBy("nation").orderBy(
        F.desc(F.round("revenue", DP)), "s_suppkey"
    )
    return (
        rev.join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "s_name", "revenue", "s_suppkey")
        .withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= _RANK_TOP)
        .select("nation", "s_name", F.round("revenue", DP).alias("revenue"), "rnk")
        .orderBy("nation", "rnk", "s_name")
    )


@query(
    "basket_concentration_hhi",
    oracle=f"""
    WITH agg AS (
      SELECT l_orderkey,
             COUNT(*) AS n_items,
             SUM(l_extendedprice * l_extendedprice)
               / (SUM(l_extendedprice) * SUM(l_extendedprice)) AS hhi
      FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           {round_cmp_sql("AVG(a.n_items)")} AS avg_items,
           {round_cmp_sql("AVG(a.hhi)")} AS avg_hhi
    FROM agg a JOIN orders o ON a.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def basket_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket concentration per order — the Herfindahl-Hirschman index
    Σ(share_i²) of line-item spend within each order, averaged per
    priority class: HHI→1 means one item dominates the basket, HHI→1/n
    means even spread. The market-concentration aggregate, applied to
    baskets.

    Scale shape: shares need the per-order total, so the plan is one
    window-free double aggregation... except shares are a ratio to a
    group sum — computed here with a single shuffle on l_orderkey: the
    groupBy computes Σx and Σx² in ONE pass and
    HHI = Σ(x²)/(Σx)² (algebraically identical to summing squared
    shares, no second pass, no window). The |orders|-row result joins
    the 2-column orders projection; the priority rollup is tiny.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.sum(F.col("l_extendedprice") * F.col("l_extendedprice"))
            / (F.sum("l_extendedprice") * F.sum("l_extendedprice"))
        ).alias("hhi"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_cmp(F.avg("n_items")).alias("avg_items"),
            round_cmp(F.avg("hhi")).alias("avg_hhi"),
        )
        .orderBy("o_orderpriority")
    )
