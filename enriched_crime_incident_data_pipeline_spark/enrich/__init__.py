"""Enrichment stages: geocode cache, weather, side-of-town.

Each stage is a pure ``DataFrame -> DataFrame`` join — the reference's
UPDATE-in-place writes (src/db/location.py, src/enrich/weather.py,
src/enrich/geography.py) recomputed functionally.
"""

from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    FixtureGeocoder,
    geocode_misses,
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import (
    weather_worklist,
    with_weather,
)
from enriched_crime_incident_data_pipeline_spark.enrich.sides import (
    with_side_of_town,
)

__all__ = [
    "FixtureGeocoder",
    "geocode_misses",
    "with_coordinates",
    "weather_worklist",
    "with_weather",
    "with_side_of_town",
]
