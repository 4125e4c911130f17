from __future__ import annotations

import pytest

from enriched_crime_incident_data_pipeline_spark import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "oracle_slice: rotating 25-query oracle-verification slice "
        "(deterministic per round; run alone with -m oracle_slice)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
