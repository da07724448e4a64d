"""Semantic cross-checks for the closed-form numeric operators: each is
validated against an INDEPENDENT straightforward implementation (a
sequential fold / a textbook allocation loop), not just the SQL oracle —
catching the class of bug where engine and oracle share a wrong
formula."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.advanced import (
    _ALLOC_BUDGET,
    _EWMA_ALPHA,
    ewma_smoothing,
    largest_remainder_alloc,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    load,
)

from conftest import SF_SMOKE


def test_ewma_closed_form_equals_sequential_fold(spark):
    # the op computes the recurrence s_t = a*x_t + (1-a)*s_{t-1} via its
    # closed form; fold it the slow sequential way and compare
    rows = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    folds: dict[int, float] = {}
    for r in rows:
        if r.user_id not in folds:
            folds[r.user_id] = r.value
        else:
            folds[r.user_id] = _EWMA_ALPHA * r.value + (1 - _EWMA_ALPHA) * folds[r.user_id]

    got = {r.user_id: r.ewma_value for r in ewma_smoothing(spark, SF_SMOKE).collect()}
    assert set(got) == set(folds)
    for uid, seq in folds.items():
        # the op emits round_cmp(·, 4); apply the identical pin to the fold
        pinned = math.floor(round(seq, 7) * 10000.0 + 0.5) / 10000.0
        assert abs(got[uid] - pinned) < 1e-9, (uid, got[uid], seq)


def test_largest_remainder_matches_textbook_loop_and_sums_exactly(spark):
    counts = {
        r.event_type: r.cnt
        for r in load(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    exact = {k: _ALLOC_BUDGET * v / total for k, v in counts.items()}
    base = {k: math.floor(x) for k, x in exact.items()}
    leftover = _ALLOC_BUDGET - sum(base.values())
    order = sorted(counts, key=lambda k: (-(exact[k] - base[k]), k))
    expected = {
        k: base[k] + (1 if i < leftover else 0) for i, k in enumerate(order)
    }

    got = {
        r.event_type: r.alloc_units
        for r in largest_remainder_alloc(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert sum(got.values()) == _ALLOC_BUDGET
    # every allocation is floor or floor+1 of its exact share
    for k, v in got.items():
        assert v in (base[k], base[k] + 1)
