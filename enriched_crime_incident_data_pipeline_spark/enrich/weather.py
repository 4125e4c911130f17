"""Weather stage (reference §2 U2/J1/A7/J5/F15/P8).

Reference behavior (/root/reference/src/enrich/weather.py:30-68):
build the DISTINCT (incident_ts, location, latitude, longitude)
work-list over the incidents⋈location join, fetch the hourly
weather-code vector per (lat, lon, date) from Open-Meteo, index it by
the incident hour with a bounds guard, and UPDATE keyed on BOTH
(incident_ts, location) — the (ts)-only keying of the legacy path was
a cross-location overwrite bug (TECHNICAL.md:171-177).

Spark design: the API becomes a ``weather_hourly`` lookup table
(FIXTURES.md §4) joined on (lat, lon, date, hour); live mode would
materialize that table via a rate-limited driver/mapPartitions fetch
over the distinct work-list, then run the identical join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weather_worklist(incidents_with_coords: DataFrame) -> DataFrame:
    """DISTINCT (incident_ts, location, latitude, longitude) with
    non-NULL coordinates (A7 + P7) — one external fetch per row of
    this list in live mode."""
    return (
        incidents_with_coords.filter(
            F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
        )
        .select("incident_ts", "location", "latitude", "longitude")
        .distinct()
    )


def with_weather(
    incidents_with_coords: DataFrame, weather_hourly: DataFrame
) -> DataFrame:
    """Attach the WMO ``weather`` code by joining the hourly lookup on
    (lat, lon, date(ts), hour(ts)).

    Missing hours / NULL coordinates yield NULL weather (bounds guard
    parity, weather.py:58,62-64 — a left join IS the guard: absent
    (date,hour) rows produce NULL instead of an index error). The
    lookup side is a dimension — broadcast."""
    wh = weather_hourly.select(
        F.col("latitude").alias("_wlat"),
        F.col("longitude").alias("_wlon"),
        F.col("date").alias("_wdate"),
        F.col("hour").alias("_whour"),
        F.col("weather_code"),
    )
    joined = incidents_with_coords.join(
        F.broadcast(wh),
        (F.col("latitude") == F.col("_wlat"))
        & (F.col("longitude") == F.col("_wlon"))
        & (F.to_date("incident_ts") == F.col("_wdate"))
        & (F.hour("incident_ts") == F.col("_whour")),
        "left",
    )
    return joined.withColumn(
        "weather", F.col("weather_code").cast("int")
    ).drop("_wlat", "_wlon", "_wdate", "_whour", "weather_code")
