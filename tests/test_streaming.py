"""Streaming twin must agree with the batch rollup on the same bounded
input (events parquet driven through a memory sink)."""

from __future__ import annotations

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.events import (
    events_hour_agg,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming import (
    events_stream,
)

from conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    streamed = events_stream.run_to_memory(spark, SF_SMOKE)
    batch = events_hour_agg(spark, SF_SMOKE)

    s_rows = {
        (r.hour, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in streamed.collect()
    }
    b_rows = {
        (r.hour, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in batch.collect()
    }
    assert s_rows == b_rows
    assert len(s_rows) > 0


def test_stateful_sessionization_matches_batch(spark):
    """applyInPandasWithState sessionizer, after replaying the bounded
    input, must land on the same per-user (n_sessions, n_events) as the
    batch gaps-and-islands query."""
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.events import (
        sessionization,
    )
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.streaming import (
        sessionize_stream,
    )

    streamed = sessionize_stream.run_to_memory(spark, SF_SMOKE)
    batch = sessionization(spark, SF_SMOKE)

    s_rows = {r.user_id: (r.n_sessions, r.n_events) for r in streamed.collect()}
    b_rows = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}
    assert s_rows == b_rows
    assert len(s_rows) > 0
