"""Live-provider semantics with mocked fetchers (no network):
Nominatim intersection fallback + rate limiting, Open-Meteo hourly
table construction + the join-back path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    LiveNominatimGeocoder,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import with_weather
from enriched_crime_incident_data_pipeline_spark.enrich.weather_live import (
    fetch_weather_hourly,
)


def test_nominatim_intersection_fallback():
    calls = []

    def fake_fetch(url):
        calls.append(url)
        if "VINE+ST%2C+Norman" in url:
            return [{"lat": "35.21", "lon": "-97.44"}]
        return []

    g = LiveNominatimGeocoder(fetcher=fake_fetch, min_delay_s=0.0)
    # direct miss → each side retried with the ", Norman, OK, USA" suffix
    lat, lon = g.geocode("VINE ST / S BERRY RD")
    assert (lat, lon) == (35.21, -97.44)
    assert len(calls) == 2  # original, then first side (hit stops it)
    assert "format=json" in calls[0]

    # un-geocodable → (None, None), all fallbacks attempted
    calls.clear()
    lat, lon = g.geocode("NOWHERE AT ALL / ALSO NOWHERE")
    assert (lat, lon) == (None, None)
    assert len(calls) == 3


def test_nominatim_rate_limit_spacing():
    import time

    times = []

    def fake_fetch(url):
        times.append(time.monotonic())
        return []

    g = LiveNominatimGeocoder(fetcher=fake_fetch, min_delay_s=0.1)
    g.geocode("A ST")
    g.geocode("B ST")
    assert times[1] - times[0] >= 0.1


def test_fetch_weather_hourly_and_join(spark):
    def fake_fetch(url):
        # deterministic vector: code = hour + 10
        return {"hourly": {"weather_code": [h + 10 for h in range(24)]}}

    worklist = spark.createDataFrame(
        [
            (dt.datetime(2026, 1, 2, 5, 0), "MAIN ST", 35.22, -97.44),
            (dt.datetime(2026, 1, 2, 7, 30), "MAIN ST", 35.22, -97.44),
        ],
        "incident_ts timestamp, location string, latitude double, longitude double",
    )
    wh = fetch_weather_hourly(spark, worklist, fetcher=fake_fetch)
    # one distinct (lat, lon, date) → 24 hourly rows
    assert wh.count() == 24

    incidents = worklist
    out = with_weather(incidents, wh)
    got = {
        r["incident_ts"].hour: r["weather"] for r in out.collect()
    }
    assert got == {5: 15, 7: 17}


def test_fetch_weather_hourly_failure_yields_empty(spark):
    def broken_fetch(url):
        raise OSError("no network")

    worklist = spark.createDataFrame(
        [(dt.datetime(2026, 1, 2, 5, 0), "MAIN ST", 35.22, -97.44)],
        "incident_ts timestamp, location string, latitude double, longitude double",
    )
    wh = fetch_weather_hourly(spark, worklist, fetcher=broken_fetch)
    assert wh.count() == 0
    # join-back degrades to NULL weather, mirroring the reference's
    # missing-hour guard (weather.py:62-64)
    out = with_weather(worklist, wh)
    assert [r["weather"] for r in out.collect()] == [None]
