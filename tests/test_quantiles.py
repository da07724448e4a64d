"""exact_quantiles (the distributed exact-quantile scale path) must
agree bitwise with Spark's built-in exact percentile — same interpolated
definition, no single-node value buffer."""

from __future__ import annotations

from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.functions.quantiles import (
    exact_quantiles,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import load
from conftest import SF_CORRECT


def test_matches_builtin_exact_percentile(spark):
    li = load(spark, SF_CORRECT, "lineitem")
    probs = [0.0, 0.25, 0.5, 0.75, 1.0]
    mine = exact_quantiles(li, "l_extendedprice", probs)
    builtin = li.agg(
        F.expr(f"percentile(l_extendedprice, array({','.join(map(str, probs))}))")
    ).collect()[0][0]
    assert all(abs(a - b) < 1e-9 for a, b in zip(mine, builtin))


def test_duplicate_heavy_column(spark):
    # l_quantity has ~50 distinct values over 60k rows — the histogram
    # degenerates to 50 rows and positions must still be exact
    li = load(spark, SF_CORRECT, "lineitem")
    mine = exact_quantiles(li, "l_quantity", [0.5, 0.9])
    builtin = li.agg(F.expr("percentile(l_quantity, array(0.5, 0.9))")).collect()[0][0]
    assert all(abs(a - b) < 1e-9 for a, b in zip(mine, builtin))


def test_edge_cases(spark):
    tiny = spark.createDataFrame([(1.0,), (1.0,), (2.0,), (5.0,)], "x double")
    assert exact_quantiles(tiny, "x", [0.0, 0.5, 1.0]) == [1.0, 1.5, 5.0]
    one = spark.createDataFrame([(3.5,)], "x double")
    assert exact_quantiles(one, "x", [0.25, 0.75]) == [3.5, 3.5]
    empty = spark.createDataFrame([], "x double")
    import math

    assert all(math.isnan(v) for v in exact_quantiles(empty, "x", [0.5]))
