"""Scale-pattern utilities: salted aggregation must be lossless, and
bucketed tables must actually eliminate the join shuffle (plan-level
proof, not vibes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import load
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.skew import (
    salted_group_agg,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.plans import (
    count_exchanges,
    final_plan,
    formatted_plan,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.bucketed import (
    drop_table,
    write_bucketed,
)
from conftest import SF_SMOKE


def test_salted_agg_equals_direct_agg(spark):
    ev = load(spark, SF_SMOKE, "events")
    direct = {
        tuple(r[:1]): (r.n, round(r.avg_value, 9), round(r.sum_value, 6), r.min_value)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.avg("value").alias("avg_value"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
        )
        .collect()
    }
    salted = {
        tuple(r[:1]): (r.n, round(r.avg_value, 9), round(r.sum_value, 6), r.min_value)
        for r in salted_group_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "event_id"),
                "avg_value": ("avg", "value"),
                "sum_value": ("sum", "value"),
                "min_value": ("min", "value"),
            },
            n_salt=8,
        ).collect()
    }
    assert salted == direct and len(direct) > 0


def test_salted_agg_rejects_non_decomposable(spark):
    ev = load(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        salted_group_agg(ev, ["event_type"], {"m": ("median", "value")})


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session enables AQE skew-join; prove it actually fires: a
    join whose left side is 95% one key must show SortMergeJoin(skew=
    true) in the POST-execution plan (runtime re-plan, not a static
    property)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k")
        j.collect()  # AQE re-plans during execution
        plan = final_plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_scaled_record_id_equals_window_mode(spark):
    """The two-phase partition-offset Record_ID (no global funnel) must
    assign exactly the ids the unpartitioned row_number would."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.record_id import (
        with_record_id,
    )

    ev = load(spark, SF_SMOKE, "events").select("event_id", "ts", "user_id")
    order = ["user_id", "ts", "event_id"]  # unique → deterministic ids
    window_ids = {
        r.event_id: r.rid
        for r in with_record_id(ev, order, id_col="rid", mode="window").collect()
    }
    scaled_ids = {
        r.event_id: r.rid
        for r in with_record_id(ev, order, id_col="rid", mode="scaled").collect()
    }
    assert scaled_ids == window_ids and len(window_ids) > 0


def test_bucketed_join_eliminates_shuffle_and_sort(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders")
    lineitem = load(spark, SF_SMOKE, "lineitem")
    try:
        write_bucketed(orders, "orders_b", str(tmp_path / "ob"), "o_orderkey")
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            str(tmp_path / "lb"),
            "o_orderkey",
        )
        # force SMJ so the comparison is exchange-count, not strategy
        with_conf = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        old = {k: spark.conf.get(k) for k in with_conf}
        for k, v in with_conf.items():
            spark.conf.set(k, v)
        try:
            bucketed = spark.table("orders_b").join(
                spark.table("lineitem_b"), "o_orderkey"
            )
            unbucketed = orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            assert count_exchanges(bucketed) == 0
            assert "SortMergeJoin" in formatted_plan(bucketed)
            assert count_exchanges(unbucketed) == 2
            # and the co-located join still returns the same rows
            assert bucketed.count() == unbucketed.count()
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
    finally:
        drop_table(spark, "orders_b")
        drop_table(spark, "lineitem_b")


def test_partitioned_layout_prunes_directories(spark, tmp_path):
    """A filter on the partition column must prune at the directory
    level (PartitionFilters), not run as a row-level residual —
    and read only the matching partition's files."""
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.plans import (
        formatted_plan,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "month", F.month("o_orderdate")
    )
    path = str(tmp_path / "orders_by_month")
    write_partitioned(orders, path, "month")

    filtered = read_partitioned(spark, path).filter(F.col("month") == 3)
    plan = formatted_plan(filtered)
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "month" in part_line and "3" in part_line

    # pruning is real: only month=3 rows come back, matching the source
    expected = orders.filter(F.col("month") == 3).count()
    assert expected > 0
    assert filtered.count() == expected


def test_range_sorted_layout_has_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted must produce files whose footer min/max
    intervals of the sort column are pairwise disjoint — the property
    that lets a selective scan skip every non-matching file — and a
    point-range read must return exactly the source rows."""
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.sorted_layout import (
        file_column_ranges,
        read_layout,
        write_range_sorted,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    path = str(tmp_path / "li_sorted")
    write_range_sorted(li, path, "l_extendedprice", n_files=8)

    ranges = sorted(file_column_ranges(path, "l_extendedprice"))
    assert len(ranges) == 8
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "file ranges overlap — no pruning possible"

    # correctness: a band filter over the layout returns the same rows
    lo, hi = ranges[3]
    got = read_layout(spark, path).filter(F.col("l_extendedprice").between(lo, hi)).count()
    want = li.filter(F.col("l_extendedprice").between(lo, hi)).count()
    assert got == want > 0
