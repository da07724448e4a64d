"""Dashboard CLI: the app's filter semantics must hold — filtered
analytics, country-only mortality trend over the FULL year axis,
unfiltered correlation."""

from __future__ import annotations

import os

import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark.jobs.dashboard import run

REFERENCE_CSV = "/root/reference/Global Health Dataset.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CSV), reason="reference dataset not present"
)


def test_dashboard_filters(spark):
    result = run(spark, REFERENCE_CSV, year=2015, country="India")

    assert result["filters"] == {"year": 2015, "country": "India"}
    # filtered sections respect the slice
    assert all(r["record_count"] >= 1 for r in result["deadliest_diseases"])
    # the trend ignores the year filter: full year axis for the country
    years = [r["Year"] for r in result["mortality_trend"]]
    assert len(years) > 1 and years == sorted(years)
    # correlation is computed on the unfiltered frame: all features present
    assert len(result["correlation_with_mortality"]) >= 10
    # overview reflects the filter (one country)
    (ov,) = result["overview"]
    assert ov["countries"] == 1
