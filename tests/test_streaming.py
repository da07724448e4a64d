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
