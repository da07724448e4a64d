from __future__ import annotations

import pytest

from health_etl_pipeline_and_analytics_with_machine_learning_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", cpus=8, shuffle_partitions=8)
    yield s
