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
