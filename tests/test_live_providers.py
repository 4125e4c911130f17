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


def test_retry_policy_matches_reference():
    """×5 retries with 0.2 s exponential backoff
    (src/enrich/weather.py:25) — pinned via the injectable wrapper."""
    from enriched_crime_incident_data_pipeline_spark.enrich.weather_live import (
        BACKOFF_S,
        RETRIES,
        with_retries,
    )

    calls, naps = [], []

    def flaky(url):
        calls.append(url)
        if len(calls) < 4:
            raise OSError("transient")
        return {"ok": True}

    fetch = with_retries(flaky, sleep=naps.append)
    assert fetch("u") == {"ok": True}
    assert len(calls) == 4
    assert naps == [BACKOFF_S, BACKOFF_S * 2, BACKOFF_S * 4]

    calls.clear()
    naps.clear()

    def dead(url):
        calls.append(url)
        raise OSError("down")

    import pytest as _pytest

    with _pytest.raises(OSError):
        with_retries(dead, sleep=naps.append)("u")
    assert len(calls) == RETRIES + 1
    assert len(naps) == RETRIES


def test_full_pipeline_with_live_provider_seams(spark):
    """§3.1 composed end-to-end against BOTH live-provider seams with
    fake network layers: PDF text-block parse → silver → anti-joined
    geocode misses through LiveNominatimGeocoder (rate-limit spacing +
    intersection fallback asserted) → cache update → distinct weather
    work-list through fetch_weather_hourly → run_pipeline gold rows."""
    import time

    from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
        geocode_misses,
        resolve_misses,
        update_cache,
        with_coordinates,
    )
    from enriched_crime_incident_data_pipeline_spark.enrich.weather import (
        weather_worklist,
    )
    from enriched_crime_incident_data_pipeline_spark.plans.pipeline import (
        run_pipeline,
    )
    from enriched_crime_incident_data_pipeline_spark.schemas import (
        LOCATION_SCHEMA,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
        parse_report_blocks,
    )

    # --- bronze via the block-parse rules (one 2-page report) ---
    pages = [
        ("r.pdf", 0, 0, "HEADER\n"),
        ("r.pdf", 0, 1, "1/2/2024 5:00\n2024-1\nBLK 100 MAIN ST\nTHEFT\nOK01\n"),
        ("r.pdf", 0, 2, "1/2/2024 7:00\n2024-2\nVINE ST / S BERRY RD\nEMS\nEMSSTAT\n"),
        ("r.pdf", 0, 3, "TRAILER A\n"),
        ("r.pdf", 0, 4, "TRAILER B\n"),
        ("r.pdf", 1, 0, "1/3/2024 9:00\n2024-3\nBLK 100 MAIN ST\nFRAUD\nOK01\n"),
        ("r.pdf", 1, 1, "END\n"),
    ]
    blocks = spark.createDataFrame(
        pages, "path string, page_number long, block_idx long, block_text string"
    )
    bronze = parse_report_blocks(blocks).select(
        "datetime_str", "incident_num", "location", "nature", "incident_ori"
    )

    # --- geocode seam: anti-join misses → live provider (faked) ---
    geo_calls: list[tuple[float, str]] = []

    def fake_geo_fetch(url):
        geo_calls.append((time.monotonic(), url))
        if "BLK+100+MAIN+ST" in url:
            return [{"lat": "35.20", "lon": "-97.40"}]
        if "VINE+ST%2C+Norman" in url:  # only the fallback form hits
            return [{"lat": "35.21", "lon": "-97.44"}]
        return []

    cache = spark.createDataFrame([], LOCATION_SCHEMA)
    geocoder = LiveNominatimGeocoder(fetcher=fake_geo_fetch, min_delay_s=0.05)
    misses = geocode_misses(bronze.withColumnRenamed("location", "location"), cache)
    resolved = resolve_misses(spark, misses, geocoder)
    cache = update_cache(cache, resolved)

    # intersection fallback resolved the ' / ' address via its first side
    coords = {r["loc"]: (r["latitude"], r["longitude"]) for r in cache.collect()}
    assert coords["BLK 100 MAIN ST"] == (35.20, -97.40)
    assert coords["VINE ST / S BERRY RD"] == (35.21, -97.44)
    # global 1-req/s-style spacing held across ALL provider calls
    gaps = [b[0] - a[0] for a, b in zip(geo_calls, geo_calls[1:])]
    assert gaps and all(g >= 0.045 for g in gaps)
    # direct query first, then the ", Norman, OK, USA"-suffixed side
    assert any("VINE+ST+%2F+S+BERRY+RD" in u for _, u in geo_calls)
    assert any("VINE+ST%2C+Norman%2C+OK%2C+USA" in u for _, u in geo_calls)

    # --- weather seam: distinct work-list → live fetch (faked) ---
    wx_urls: list[str] = []

    def fake_wx_fetch(url):
        wx_urls.append(url)
        return {"hourly": {"weather_code": [h + 40 for h in range(24)]}}

    from enriched_crime_incident_data_pipeline_spark.operators.derive import (
        to_silver,
    )

    silver_coords = with_coordinates(to_silver(bronze), cache)
    wh = fetch_weather_hourly(
        spark, weather_worklist(silver_coords), fetcher=fake_wx_fetch
    )
    # one call per distinct (lat, lon, date): MAIN ST on 2 days + VINE on 1
    assert len(wx_urls) == 3
    assert all("hourly=weather_code" in u for u in wx_urls)

    # --- full pipeline over the seam outputs ---
    gold = run_pipeline(bronze, None, cache, wh)
    rows = {r["nature"]: r for r in gold.collect()}
    assert len(rows) == 3
    assert rows["EMS"]["weather"] == 47  # hour 7 + 40
    assert rows["THEFT"]["weather"] == 45
    assert rows["EMS"]["emsstat"] == 1 and rows["THEFT"]["emsstat"] == 0
    assert rows["THEFT"]["day_of_week"] == 3  # 1/2/2024 is a Tuesday
