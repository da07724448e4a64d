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
        "Top 5 Deadliest Diseases",
        "Top 5 Treatment Costs",
        "Gender Split of Deadliest",
        "Model Metrics",
        "Feature Importances (top 10)",
        "Example Prediction",
    ]

    top5 = [r["Disease Name"] for r in rep["sections"][1]["rows"]]
    assert top5[0] == "Hypertension"  # BASELINE.md verified q1 output
    assert len(top5) == 5

    metrics = {r["metric"]: r["value"] for r in rep["sections"][4]["rows"]}
    assert set(metrics) >= {"R2_Score", "MAE", "MSE"}

    pred = rep["sections"][6]["rows"][0]["predicted_mortality_rate"]
    assert 0.0 <= pred <= 1.0

    # silver table + report files (JSON fallback: no reportlab/openpyxl here)
    assert os.path.exists(tmp_path / "silver.parquet")
    artifacts = {p.name for p in tmp_path.iterdir()}
    assert any("health_weekly_report" in a for a in artifacts)
