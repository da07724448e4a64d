"""ML smoke tests (SURVEY §5.2): pipeline fits, metrics in a sane band on
the reference dataset, importances well-formed, single prediction works.
No sklearn-bitwise parity — different libraries, different split
semantics; assert properties, not values."""

from __future__ import annotations

import os

import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark import ml
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


@pytest.fixture(scope="module")
def trained(spark):
    raw = read_csv_raw(spark, REFERENCE_CSV)
    cleaned = clean_health_dataframe(raw, country_corrections=REFERENCE_COUNTRY_CORRECTIONS)
    cleaned.cache()
    return ml.train_mortality_model(cleaned)


def test_metrics_sane(trained):
    m = trained.metrics
    # mortality is noisy synthetic data; the reference model is weak too —
    # assert bounded error and non-degenerate split, not predictive power
    assert -1.0 <= m["R2_Score"] <= 1.0
    assert 0.0 <= m["MAE"] <= 0.2  # target range is ~0-0.3
    assert m["Train_Samples"] + m["Test_Samples"] == 10006
    assert 0.15 <= m["Test_Samples"] / 10006 <= 0.25


def test_feature_importances(trained):
    imps = trained.feature_importances()
    assert len(imps) == len(trained.feature_cols)
    total = sum(v for _, v in imps)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(v >= 0 for _, v in imps)
    # Severity Score embeds 0.7·mortality — it must dominate
    assert imps[0][0] == "Severity_Score"


def test_predict_single(trained):
    p = trained.predict_single({"Severity_Score": 2.0, "DALYs": 30000.0})
    assert isinstance(p, float)
    assert 0.0 <= p <= 0.5
