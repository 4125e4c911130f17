"""Sources: testdata catalog, report-URL discovery, binary (PDF)
ingestion plumbing."""

from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)
from enriched_crime_incident_data_pipeline_spark.sources.urls import (
    classify_report_urls,
    new_incident_urls,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "classify_report_urls",
    "new_incident_urls",
]
