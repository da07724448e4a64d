"""The scheduled weekly report as a spark-submit-able batch job —
entry point C of the reference (nb@28, SURVEY §3.3), recomposed over
the engine: ETL → query library → MLlib model → driver-side artifacts.

Usage::

    spark-submit -m health_etl_pipeline_and_analytics_with_machine_learning_spark.jobs.weekly_report \
        <raw_csv> <out_dir>        # or: python -m ... <raw_csv> <out_dir>

The reference re-runs this as a notebook with hard-coded SMTP
credentials (nb@28:36-40); here email is opt-in via environment config
(HEALTH_REPORT_SMTP_HOST/PORT/SENDER/PASSWORD/RECIPIENT) and the job is
a pure batch pipeline otherwise. Report inputs are ≤ 50-row aggregates,
so the driver-side rendering is scale-independent.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

from .. import quality, queries
from ..ml import train_mortality_model
from ..pipeline import clean_health_dataset
from ..report import (
    build_report,
    collect_section,
    send_email,
    write_pdf,
    write_xlsx,
)
from ..session import get_spark
from .. import report as report_mod


def run(
    spark: SparkSession, raw_csv: str, out_dir: str, train_model: bool = True
) -> dict:
    """Produce the weekly-report artifacts; returns the report dict."""
    os.makedirs(out_dir, exist_ok=True)
    cleaned = clean_health_dataset(
        spark, raw_csv, output_path=os.path.join(out_dir, "silver.parquet")
    )
    cleaned = spark.read.parquet(os.path.join(out_dir, "silver.parquet"))

    sections = [
        collect_section("Overview", queries.overview_metrics(cleaned)),
        # data-quality section (reference nb@0:342-404): shape/dup counts,
        # per-column nulls, key-metric summary — the QA tables the
        # reference eyeballs before trusting the week's numbers
        collect_section("Data Quality — Shape", quality.shape_report(cleaned)),
        collect_section(
            "Data Quality — Nulls per Column", quality.null_report(cleaned)
        ),
        collect_section(
            "Data Quality — Key Metrics", quality.key_metric_summary(cleaned)
        ),
        collect_section("Top 5 Deadliest Diseases", queries.q1_deadliest_diseases(cleaned, 5)),
        collect_section("Top 5 Treatment Costs", queries.q4_treatment_cost(cleaned).limit(5)),
        collect_section("Gender Split of Deadliest", queries.q5_gender_split(cleaned, 5)),
    ]

    if train_model:
        trained = train_mortality_model(cleaned)  # app variant (nb@28 uses dummies)
        sections.append(
            report_mod.ReportSection(
                "Model Metrics",
                [{"metric": k, "value": round(v, 6)} for k, v in trained.metrics.items()],
            )
        )
        sections.append(
            report_mod.ReportSection(
                "Feature Importances (top 10)",
                [
                    {"feature": f, "importance": round(w, 6)}
                    for f, w in trained.feature_importances()[:10]
                ],
            )
        )
        example = trained.predict_single({})  # all-median row (nb@28:124-130 analog)
        sections.append(
            report_mod.ReportSection(
                "Example Prediction", [{"predicted_mortality_rate": example}]
            )
        )

    rep = build_report(sections)
    pdf_path = write_pdf(rep, os.path.join(out_dir, "health_weekly_report.pdf"))
    write_xlsx(rep, os.path.join(out_dir, "health_weekly_report.xlsx"))

    smtp_host = os.environ.get("HEALTH_REPORT_SMTP_HOST")
    if smtp_host:
        send_email(
            report_path=pdf_path,
            smtp_host=smtp_host,
            smtp_port=int(os.environ.get("HEALTH_REPORT_SMTP_PORT", "587")),
            sender=os.environ["HEALTH_REPORT_SENDER"],
            password=os.environ["HEALTH_REPORT_PASSWORD"],
            recipient=os.environ["HEALTH_REPORT_RECIPIENT"],
        )
    return rep


def main() -> None:
    raw_csv, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark(app_name="weekly_report")
    try:
        run(spark, raw_csv, out_dir)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
