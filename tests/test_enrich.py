"""Geocode cache / weather-join enrichment stages
(reference src/db/location.py, src/enrich/weather.py)."""

from __future__ import annotations

import datetime as dt

from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    FixtureGeocoder,
    geocode_misses,
    resolve_misses,
    update_cache,
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import (
    weather_worklist,
    with_weather,
)
from enriched_crime_incident_data_pipeline_spark.schemas import (
    LOCATION_SCHEMA,
    WEATHER_HOURLY_SCHEMA,
)

INCIDENTS = [
    ("n1", dt.datetime(2024, 4, 3, 5, 0), "123 MAIN ST"),
    ("n2", dt.datetime(2024, 4, 3, 5, 0), "123 MAIN ST"),
    ("n3", dt.datetime(2024, 4, 3, 6, 0), "VINE ST / S BERRY RD"),
    ("n4", dt.datetime(2024, 4, 3, 7, 0), "UNKNOWN PLACE"),
]
INC_SCHEMA = "incident_num string, incident_ts timestamp, location string"


def test_geocode_miss_list_is_anti_join_of_distinct_locations(spark):
    inc = spark.createDataFrame(INCIDENTS, INC_SCHEMA)
    cache = spark.createDataFrame([("123 MAIN ST", 35.2, -97.4, None)], LOCATION_SCHEMA)
    misses = sorted(r["loc"] for r in geocode_misses(inc, cache).collect())
    assert misses == ["UNKNOWN PLACE", "VINE ST / S BERRY RD"]


def test_intersection_fallback_and_unresolvable(spark):
    # reference src/db/location.py:18-32: 'A / B' retries each side
    inc = spark.createDataFrame(INCIDENTS, INC_SCHEMA)
    cache = spark.createDataFrame([("123 MAIN ST", 35.2, -97.4, None)], LOCATION_SCHEMA)
    provider = FixtureGeocoder({"VINE ST": (35.21, -97.44)})
    resolved = resolve_misses(spark, geocode_misses(inc, cache), provider)
    got = {r["loc"]: (r["latitude"], r["longitude"]) for r in resolved.collect()}
    assert got["VINE ST / S BERRY RD"] == (35.21, -97.44)
    assert got["UNKNOWN PLACE"] == (None, None)  # NULL coords kept (location.py:55-56)

    new_cache = update_cache(cache, resolved)
    assert new_cache.count() == 3  # existing key untouched, 2 appended


def test_with_coordinates_left_join_keeps_unresolved(spark):
    inc = spark.createDataFrame(INCIDENTS, INC_SCHEMA)
    cache = spark.createDataFrame(
        [("123 MAIN ST", 35.2, -97.4, None), ("UNKNOWN PLACE", None, None, None)],
        LOCATION_SCHEMA,
    )
    out = {r["incident_num"]: r["latitude"] for r in with_coordinates(inc, cache).collect()}
    assert out["n1"] == 35.2
    assert out["n3"] is None  # not in cache at all
    assert out["n4"] is None  # cached as un-geocodable


def test_weather_worklist_distinct_nonnull(spark):
    inc = spark.createDataFrame(INCIDENTS, INC_SCHEMA)
    cache = spark.createDataFrame([("123 MAIN ST", 35.2, -97.4, None)], LOCATION_SCHEMA)
    wl = weather_worklist(with_coordinates(inc, cache))
    # n1/n2 share (ts, loc) → 1 row; n3/n4 have NULL coords → dropped
    assert wl.count() == 1


def test_with_weather_join_and_missing_hour_guard(spark):
    inc = spark.createDataFrame(INCIDENTS, INC_SCHEMA)
    cache = spark.createDataFrame(
        [
            ("123 MAIN ST", 35.2, -97.4, None),
            ("VINE ST / S BERRY RD", 35.21, -97.44, None),
        ],
        LOCATION_SCHEMA,
    )
    wh = spark.createDataFrame(
        # hour 5 present for MAIN ST; hour 6 missing for VINE ST →
        # NULL weather (bounds-guard parity, weather.py:58,62-64)
        [(35.2, -97.4, dt.date(2024, 4, 3), 5, 63)],
        WEATHER_HOURLY_SCHEMA,
    )
    out = {
        r["incident_num"]: r["weather"]
        for r in with_weather(with_coordinates(inc, cache), wh).collect()
    }
    assert out == {"n1": 63, "n2": 63, "n3": None, "n4": None}
