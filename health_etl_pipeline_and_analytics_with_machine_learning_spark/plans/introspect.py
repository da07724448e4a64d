"""Physical-plan introspection — the engine's "is this the plan I'd
want at 100 TB?" surface (SURVEY §4).

The reference has no plans to inspect (eager pandas + SQLite's internal
VDBE); this engine's correctness-at-scale contract is that every query
keeps the properties below, and `tests/test_plans.py` pins them as
regressions:

- **predicate pushdown**: filters on stored columns reach the parquet
  scan (`PushedFilters`) → row-group min/max pruning at scale;
- **column pruning**: `ReadSchema` carries only referenced columns — a
  scan reading 16 columns for a 3-column query is wrong at any scale;
- **partial aggregation**: every groupBy shows `partial_*` functions
  below its Exchange (map-side combine — the shuffle carries one row
  per (task, key), not per input row);
- **join strategy**: dimension-sized sides are broadcast
  (`BroadcastHashJoin`); no accidental `CartesianProduct`;
- **shuffle count**: `Exchange` nodes are the unit of cost at scale —
  each one is a full network rewrite of the stream. Tests pin the
  expected count so an innocent refactor can't silently add one.

Parsing the `formatted` explain output is deliberate: it is the same
stable, line-oriented text surface a human reads, so the helpers double
as documentation of what to look for.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: physical join operators, most→least desirable for a big⋈small join
JOIN_OPERATORS = (
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain string `df.explain(mode)` would print, as a value."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def final_plan(df: DataFrame) -> str:
    """The post-AQE executed plan. Only meaningful AFTER an action has
    run on ``df`` (AQE re-plans at runtime; before execution the string
    shows isFinalPlan=false and the initial shape)."""
    return formatted_plan(df, mode="simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet-pushed predicates across every scan in the plan,
    e.g. ``['IsNotNull(l_extendedprice)', 'EqualTo(event_type,click)']``."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    # EqualTo(a,b) splits on its inner comma — re-join orphan fragments
    merged: list[str] = []
    for piece in out:
        if merged and piece.endswith(")") and "(" not in piece:
            merged[-1] = f"{merged[-1]},{piece}"
        else:
            merged.append(piece)
    return merged


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        fields = m.group(1)
        schemas.append(
            [f.split(":")[0].strip() for f in fields.split(",") if ":" in f]
        )
    return schemas


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the (pre-AQE) plan."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators present, in JOIN_OPERATORS order."""
    plan = formatted_plan(df)
    return [op for op in JOIN_OPERATORS if re.search(rf"\(\d+\) {op}", plan)]


def partial_agg_functions(df: DataFrame) -> list[str]:
    """The ``partial_*`` aggregate functions (map-side combine proof)."""
    plan = formatted_plan(df)
    return sorted(set(re.findall(r"partial_(\w+)", plan)))
