from __future__ import annotations

import pytest

from enriched_crime_incident_data_pipeline_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
