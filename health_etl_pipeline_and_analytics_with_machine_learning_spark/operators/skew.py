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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    {sum, count, min, max, avg}. Example::

        salted_group_agg(ev, ["event_type"],
                         {"n": ("count", "event_id"),
                          "avg_value": ("avg", "value")})
    """
    partials: dict[str, Column] = {}
    merges: dict[str, Column] = {}
    finals: dict[str, Column] = {}
    for out, (fn, col) in aggs.items():
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
