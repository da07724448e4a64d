"""Dual-surface differential tests for the health analytics library:
the DataFrame build and the SQL twin must agree — the reference's own
pandas-vs-SQL strategy (SURVEY §5.1), automated."""

from __future__ import annotations

import os

import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark import queries as Q
from health_etl_pipeline_and_analytics_with_machine_learning_spark import quality
from health_etl_pipeline_and_analytics_with_machine_learning_spark.functions.cleaning import (
    REFERENCE_COUNTRY_CORRECTIONS,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.pipeline import (
    clean_health_dataframe,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.ingest import (
    read_csv_raw,
)

REFERENCE_CSV = "/root/reference/Global Health Dataset.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CSV), reason="reference dataset not present"
)

DF_FNS = {
    "q1_deadliest_diseases": Q.q1_deadliest_diseases,
    "q2_recovery_trends": Q.q2_recovery_trends,
    "q3_access_vs_mortality": Q.q3_access_vs_mortality,
    "q4_treatment_cost": Q.q4_treatment_cost,
    "q5_gender_split": Q.q5_gender_split,
    "q6_urban_rural_level1": Q.q6_urban_rural_level1,
}


@pytest.fixture(scope="module")
def cleaned(spark):
    raw = read_csv_raw(spark, REFERENCE_CSV)
    df = clean_health_dataframe(raw, country_corrections=REFERENCE_COUNTRY_CORRECTIONS)
    df.cache()
    df.createOrReplaceTempView(Q.VIEW)
    yield df
    df.unpersist()


def _rounded(rows):
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        )
    return out


@pytest.mark.parametrize("name", sorted(Q.sql_twins()))
def test_dataframe_matches_sql_twin(spark, cleaned, name):
    df_rows = _rounded([tuple(r) for r in DF_FNS[name](cleaned).collect()])
    sql_rows = _rounded([tuple(r) for r in spark.sql(Q.sql_twins()[name]).collect()])
    assert df_rows == sql_rows


def test_q6_two_level_semantics(cleaned):
    """Level-2 is an avg-of-avgs of level-1 output, not a flat average."""
    out = Q.q6_urban_rural_disease_rank(cleaned)
    rows = out.collect()
    assert 0 < len(rows) <= 50
    assert out.columns[0] == "Disease Name"


def test_gender_impact_melted(cleaned):
    rows = Q.gender_impact_melted(cleaned).collect()
    genders = {r["Gender"] for r in rows}
    assert genders == {"Total_Male", "Total_Female"}
    n_diseases = cleaned.select("Disease Name").distinct().count()
    assert len(rows) == 2 * n_diseases


def test_correlation_with_mortality(cleaned):
    rows = Q.correlation_with_mortality(cleaned).collect()
    assert all(-1.0 <= r["correlation"] <= 1.0 for r in rows if r["correlation"] is not None)
    assert len(rows) >= 15


def test_overview_metrics(cleaned):
    row = Q.overview_metrics(cleaned).first()
    assert row.total_records == 10006
    assert row.countries == 21
    assert row.diseases == 21


def test_quality_reports(cleaned):
    nulls = quality.null_report(cleaned).collect()
    assert all(r.null_count == 0 for r in nulls)  # post-sweep: no nulls anywhere
    shape = quality.shape_report(cleaned).first()
    assert shape.n_rows == 10006 and shape.n_duplicates == 0
    assert quality.sample_rows(cleaned).count() == 5


def test_mortality_trend_country_slice(cleaned):
    all_years = Q.mortality_trend(cleaned).collect()
    one = Q.mortality_trend(cleaned, country="Turkey").collect()
    assert len(all_years) >= len(one) > 0
    years = [r.Year for r in one]
    assert years == sorted(years)
