"""Stateful streaming sessionization — the custom-stateful-operator
pattern (``applyInPandasWithState``) the engine uses when built-in
windowed aggregation can't express the semantics.

Batch twin: ``operators.events.sessionization`` (lag/gaps-and-islands).
The built-in ``F.session_window`` covers plain session *windows*; this
operator exists for the general shape — arbitrary per-key running state
(here: last-seen timestamp + session/event counters) carried across
micro-batches, with Arrow-batched pandas doing the per-key compute.

Scale notes:
- state is ONE tiny tuple per user (last_ts, n_sessions, n_events) in
  the state store — size is O(active users), never O(events);
- each micro-batch shuffles once on user_id (same key as the state
  store partitioning, so state lookups are local);
- per-group compute is vectorized numpy over the Arrow batch, not a
  Python row loop;
- production would add an event-time timeout (GroupStateTimeout) to
  expire idle users and bound the store; the bounded-replay test path
  keeps NoTimeout so final counters equal the batch answer exactly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events_stream import read_events_stream

GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts long, n_sessions long, n_events long"


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    last_ts, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        ts = pdf["ts"].astype("int64").to_numpy() // 1_000_000_000  # epoch s
        prev = np.empty_like(ts)
        prev[1:] = ts[:-1]
        if last_ts is None:
            # first event ever for this user always opens a session
            prev[0] = ts[0] - GAP_SECONDS - 1
        else:
            prev[0] = last_ts
        n_sessions += int((ts - prev > GAP_SECONDS).sum())
        n_events += len(ts)
        last_ts = int(ts[-1])
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user running session/event counters with a 30-minute
    inactivity gap, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "sessions_stream"
) -> DataFrame:
    """Drive the bounded events parquet through the stateful operator
    (memory sink, update mode) and return the LAST update per user —
    which, after full replay, must equal the batch sessionization."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    updates = spark.sql(f"SELECT * FROM {query_name}")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
