"""End-to-end batch job: the weekly report must run off the reference's
own dirty CSV and produce the full artifact set (nb@28 parity)."""

from __future__ import annotations

import os

import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark.jobs.weekly_report import run

REFERENCE_CSV = "/root/reference/Global Health Dataset.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CSV), reason="reference dataset not present"
)


def test_weekly_report_end_to_end(spark, tmp_path):
    rep = run(spark, REFERENCE_CSV, str(tmp_path), train_model=True)

    titles = [s["title"] for s in rep["sections"]]
    assert titles == [
        "Overview",
        "Data Quality — Shape",
        "Data Quality — Nulls per Column",
        "Data Quality — Key Metrics",
        "Top 5 Deadliest Diseases",
        "Top 5 Treatment Costs",
        "Gender Split of Deadliest",
        "Model Metrics",
        "Feature Importances (top 10)",
        "Example Prediction",
    ]
    by_title = {s["title"]: s["rows"] for s in rep["sections"]}

    # quality section (nb@0:342-404 parity): the silver table is fully
    # cleaned, so zero nulls everywhere, zero duplicate rows, and the
    # key-metric summary carries all eight aggregates
    shape = by_title["Data Quality — Shape"][0]
    assert shape["n_rows"] > 0 and shape["n_duplicates"] == 0
    nulls = by_title["Data Quality — Nulls per Column"]
    assert nulls and all(r["null_count"] == 0 for r in nulls)
    km = by_title["Data Quality — Key Metrics"][0]
    assert set(km) == {
        "mean_mortality", "max_mortality", "min_mortality",
        "mean_recovery", "max_recovery", "min_recovery",
        "mean_cost", "median_cost",
    }
    assert km["min_mortality"] <= km["mean_mortality"] <= km["max_mortality"]

    top5 = [r["Disease Name"] for r in by_title["Top 5 Deadliest Diseases"]]
    assert top5[0] == "Hypertension"  # BASELINE.md verified q1 output
    assert len(top5) == 5

    metrics = {r["metric"]: r["value"] for r in by_title["Model Metrics"]}
    assert set(metrics) >= {"R2_Score", "MAE", "MSE"}

    pred = by_title["Example Prediction"][0]["predicted_mortality_rate"]
    assert 0.0 <= pred <= 1.0

    # silver table + report files (JSON fallback: no reportlab/openpyxl here)
    assert os.path.exists(tmp_path / "silver.parquet")
    artifacts = {p.name for p in tmp_path.iterdir()}
    assert any("health_weekly_report" in a for a in artifacts)
