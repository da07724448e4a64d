"""Skew mitigation: two-phase salted aggregation.

AQE's skew-join splitting handles skewed JOINS at runtime; a skewed
GROUP BY key (one country = 40% of all rows at 100 TB) still funnels
that key's partial aggregates into a single reduce task. Salting splits
each hot key across ``n_salt`` sub-keys, aggregates the sub-keys in
parallel, then merges the decomposable partials in a second, tiny
aggregation over |keys| × n_salt rows.

Only decomposable aggregates are offered (sum/count/min/max and avg as
sum÷count) — exactly the set whose two-phase merge is lossless. The
partial-agg Exchange carries (key, salt)-grained rows, so the widest
task handles 1/n_salt of the hottest key.

Note Spark's own partial aggregation already achieves this WITHIN each
map task; salting matters when per-key state is too big for the final
reduce task — i.e. the merge phase itself, which is what this helper
parallelizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query, round_cmp, round_cmp_sql

#: (partial expr builder, merge expr builder) per supported aggregate
_DECOMPOSABLE = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """``groupBy(keys).agg(...)`` with a salt-split merge.

    ``aggs`` maps output column name → (fn, input column), fn in
    {sum, count, min, max, avg}; column ``"*"`` with ``count`` means
    SQL ``COUNT(*)`` (count rows, not non-null values). Example::

        salted_group_agg(ev, ["event_type"],
                         {"n": ("count", "*"),
                          "avg_value": ("avg", "value")})
    """
    partials: dict[str, Column] = {}
    merges: dict[str, Column] = {}
    finals: dict[str, Column] = {}
    for out, (fn, col) in aggs.items():
        if fn == "count" and col == "*":
            col = F.lit(1)
        if fn == "avg":
            partials[f"__{out}_s"] = F.sum(col)
            partials[f"__{out}_c"] = F.count(col)
            merges[f"__{out}_s"] = F.sum(f"__{out}_s")
            merges[f"__{out}_c"] = F.sum(f"__{out}_c")
            finals[out] = F.col(f"__{out}_s") / F.col(f"__{out}_c")
        elif fn in _DECOMPOSABLE:
            part, merge = _DECOMPOSABLE[fn]
            partials[f"__{out}"] = part(col)
            merges[f"__{out}"] = merge(f"__{out}")
            finals[out] = F.col(f"__{out}")
        else:
            raise ValueError(f"{fn!r} is not a decomposable aggregate")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salt).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[e.alias(n) for n, e in partials.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(*[e.alias(n) for n, e in merges.items()])
    return phase2.select(*keys, *[e.alias(n) for n, e in finals.items()])


@query(
    "salted_skew_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           {round_cmp_sql("AVG(value)")} AS avg_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the event-type key — semantically
    identical to a plain ``GROUP BY`` (which is exactly what the oracle
    runs), physically split so no reduce task ever owns a whole hot key.

    The salt is transparent because only decomposable aggregates are
    merged (sum/count/min/max, avg as sum÷count) — the oracle proves the
    decomposition lossless. At 100 TB with one key taking 40% of rows,
    the phase-1 Exchange carries (key, salt)-grained partials, capping
    the widest reduce task at 1/n_salt of the hot key; phase 2 merges
    |keys|·n_salt tiny rows.
    """
    ev = load(spark, sf_dir, "events")
    out = salted_group_agg(
        ev,
        ["event_type"],
        {
            # "*" = COUNT(*) row semantics, matching the oracle even if a
            # future fixture carries null event_ids
            "n_events": ("count", "*"),
            "sum_value_raw": ("sum", "value"),
            "avg_value_raw": ("avg", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value_raw", 4).alias("sum_value"),
        round_cmp(F.col("avg_value_raw")).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    ).orderBy("event_type")


#: orders-per-customer threshold above which a key is treated as hot
_HOT_MIN_ORDERS = 20
#: salt fan-out for the hot-key join slice
_JOIN_SALT = 8


@query(
    "salted_skew_join",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 4) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe big-big equi-join via a hot/cold split — semantically a
    plain ``orders ⋈ customer`` (exactly what the oracle runs), executed
    the way you survive one customer owning 40% of all orders when the
    dim side is too big to broadcast:

    1. HOT-KEY DETECTION: one narrow count-aggregate finds keys above
       ``_HOT_MIN_ORDERS``; the surviving key list is tiny by definition
       and broadcasts everywhere it's used.
    2. COLD SLICE: normal shuffle join — no hot key, no straggler.
    3. HOT SLICE: fact rows get a DETERMINISTIC salt
       (``xxhash64(o_orderkey) mod {_JOIN_SALT}``, not rand() — reruns
       and retries place every row identically), dim rows for hot keys
       are exploded ×{_JOIN_SALT}, and the join key becomes
       (custkey, salt): the hottest key's rows spread over
       {_JOIN_SALT} reduce tasks instead of one.
    4. Union, then aggregate — the decomposable rollup makes the split
       invisible in the result.

    ``shuffle_hash`` hints pin both slices to shuffled joins so the plan
    demonstrates (and the plan test asserts) the salt doing the work —
    on this corpus Spark would otherwise just broadcast the dim, which
    is the right call at dim≤threshold but not the scenario this
    operator exists for. AQE's skew-split handles sort-merge stragglers
    reactively; explicit salting is the proactive variant that also
    covers shuffled-hash joins and deterministic replays.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    hot_keys = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > _HOT_MIN_ORDERS)
        .select("o_custkey", F.lit(1).alias("__hot"))
    )
    fact = o.join(F.broadcast(hot_keys), "o_custkey", "left")

    cold = (
        fact.filter(F.col("__hot").isNull())
        .join(c.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_nationkey", "o_totalprice")
    )

    salt = F.pmod(F.xxhash64("o_orderkey"), F.lit(_JOIN_SALT)).cast("int")
    fact_hot = fact.filter(F.col("__hot").isNotNull()).withColumn("__salt", salt)
    dim_hot = (
        c.join(
            F.broadcast(hot_keys.select(F.col("o_custkey").alias("c_custkey"))),
            "c_custkey",
        )
        .withColumn(
            "__salt",
            F.explode(F.array(*[F.lit(i) for i in range(_JOIN_SALT)])),
        )
    )
    hot = (
        fact_hot.join(
            dim_hot.hint("shuffle_hash"),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (fact_hot["__salt"] == dim_hot["__salt"]),
        )
        .select("c_nationkey", "o_totalprice")
    )

    return (
        cold.unionByName(hot)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .orderBy("n_name")
    )


#: heavy-hitter threshold: keys owning > 1/K of the stream
_HH_K = 25
#: the synthesized skewed key: 30% of events concentrate on 3 hot keys
#: (ids ≡ 0,1,2 mod 10 map to key id%5 ∈ {0,1,2} — ~10% each, far above
#: the 1/25 = 4% bar), the rest spread over 997 cold keys (~0.07% each,
#: far below) — a deterministic zipf-ish feed the oracle can re-derive
_HH_KEY_SQL = (
    "CASE WHEN event_id % 10 < 3 THEN event_id % 5"
    " ELSE 1000 + event_id % 997 END"
)


def _misra_gries_candidates(batches):
    """Pass-1 sketch: one Misra–Gries summary (capacity _HH_K counters)
    per partition, emitting its surviving keys as candidates. The fold
    is inherently sequential O(1)-state per partition — the same stream
    fold a JVM implementation runs; Python-level cost is pass-1 only,
    and pass 2 (the certified output) is exact and engine-native."""
    import pandas as pd

    counters: dict[int, int] = {}
    for pdf in batches:
        for key in pdf["hk"]:
            key = int(key)
            if key in counters:
                counters[key] += 1
            elif len(counters) < _HH_K:
                counters[key] = 1
            else:
                for kk in list(counters):
                    counters[kk] -= 1
                    if counters[kk] == 0:
                        del counters[kk]
    yield pd.DataFrame({"hk": sorted(counters)})


@query(
    "heavy_hitters_twopass",
    oracle=f"""
    WITH keyed AS (
      SELECT {_HH_KEY_SQL} AS hk FROM events
    ),
    tot AS (SELECT COUNT(*) AS n FROM keyed)
    SELECT k.hk, COUNT(*) AS n_events,
           {round_cmp_sql("COUNT(*) * 1.0 / ANY_VALUE(t.n)", 6)} AS share
    FROM keyed k, tot t
    GROUP BY k.hk
    HAVING COUNT(*) * {_HH_K} > ANY_VALUE(t.n)
    ORDER BY k.hk
    """,
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (keys owning > 1/{_HH_K} of the stream) in two
    passes — the classic pattern for "top offenders" over a corpus too
    big to GROUP BY in full when the key space is huge (URLs, client
    IPs, token n-grams):

    1. SKETCH: a Misra–Gries summary per partition (mapInPandas,
       {_HH_K} counters of O(1) state). MG guarantees any key with local
       frequency > local_n/({_HH_K}+1) survives its partition, and a
       globally-heavy key must be locally heavy somewhere (pigeonhole),
       so the union of per-partition candidates (≤ {_HH_K}·P keys, tiny)
       is a SUPERSET of the true heavy hitters regardless of how rows
       were partitioned.
    2. VERIFY: exact counts of the candidate keys only — the IN filter
       pushes to the scan, the groupBy touches ≤ {_HH_K}·P keys — then
       the exact > n/{_HH_K} threshold drops every false candidate.

    The output is therefore EXACT and partitioning-independent (which is
    what lets a DuckDB HAVING clause certify it), while the full-key
    GROUP BY the oracle runs is precisely what pass 1+2 avoid at 100 TB:
    the engine never aggregates the cold-key long tail.
    """
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(F.expr(_HH_KEY_SQL).alias("hk"))
    candidates = [
        int(r.hk)
        for r in keyed.mapInPandas(_misra_gries_candidates, schema="hk long")
        .distinct()
        .collect()
    ]
    n = keyed.count()
    return (
        keyed.filter(F.col("hk").isin(candidates))
        .groupBy("hk")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") * _HH_K > F.lit(n))
        .select(
            "hk",
            "n_events",
            round_cmp(F.col("n_events") / F.lit(float(n)), 6).alias("share"),
        )
        .orderBy("hk")
    )
