from enriched_crime_incident_data_pipeline_spark.plans.pipeline import (
    enrich_incidents,
    run_pipeline,
)
from enriched_crime_incident_data_pipeline_spark.plans.events_adapter import (
    events_as_incidents_raw,
    synthetic_location_dim,
    synthetic_weather_hourly,
)

__all__ = [
    "enrich_incidents",
    "run_pipeline",
    "events_as_incidents_raw",
    "synthetic_location_dim",
    "synthetic_weather_hourly",
]
