"""Stateful streaming sessionization (applyInPandasWithState) must
reproduce the batch gaps-and-islands answer exactly from a chunked
micro-batch replay — including state carried across micro-batches."""

from __future__ import annotations

from conftest import SF_SMOKE

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.sessionize import (
    stream_sessionization,
)


def test_stream_final_equals_batch(spark):
    stream = [tuple(r) for r in stream_sessionization(spark, SF_SMOKE).collect()]
    batch = [
        tuple(r) for r in REGISTRY["sessionization"].fn(spark, SF_SMOKE).collect()
    ]
    assert stream == batch
    assert len(stream) > 0


def test_state_actually_crosses_microbatches(spark):
    final = stream_sessionization(spark, SF_SMOKE, n_chunks=4)
    n_users = final.count()
    # the memory sink accumulates one update row per (user, micro-batch
    # that saw the user); with 4 time-ordered chunks most users appear in
    # several batches — if updates == users the replay degenerated to a
    # single batch and the cross-batch state path went untested
    n_updates = spark.sql("SELECT COUNT(*) AS n FROM sessionize_updates").first()["n"]
    assert n_updates > n_users


def test_registered_with_oracle():
    rq = REGISTRY["streaming_sessionization"]
    assert rq.oracle is not None and "INTERVAL 30 MINUTE" in rq.oracle
    assert "streaming" in rq.tags


def test_stream_hour_rollup_equals_batch():
    rq = REGISTRY["streaming_hour_rollup"]
    assert rq.oracle is not None and "date_trunc" in rq.oracle


def test_stream_hour_rollup_values(spark):
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.events import (
        events_hour_agg,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.sessionize import (
        stream_hour_rollup,
    )

    rows = stream_hour_rollup(spark, SF_SMOKE).collect()
    # r12: the stream carries HLL++ approx distinct users; the op's
    # contract is the batch-exact count column plus an earned bound flag
    assert all(r["approx_users_within_bound"] for r in rows)
    stream = {
        (r["hour"], r["event_type"], r["n_events"], r["sum_value"], r["n_users_exact"])
        for r in rows
    }
    batch = {
        tuple(r)
        for r in events_hour_agg(spark, SF_SMOKE).select(
            "hour", "event_type", "n_events", "sum_value", "n_users"
        ).collect()
    }
    assert stream == batch and len(stream) > 0


def test_stream_stream_join_equals_batch_range_join(spark):
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
        load,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming.sessionize import (
        stream_view_purchase_join,
    )

    stream = sorted(
        tuple(r) for r in stream_view_purchase_join(spark, SF_SMOKE).collect()
    )
    ev = load(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    batch = sorted(
        tuple(r)
        for r in p.join(v, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.countDistinct("view_id").alias("n_views"),
        )
        .collect()
    )
    assert stream == batch and len(stream) > 0
