"""Adapter: the driver's ``events`` testdata table → incident-pipeline
shapes.

The reference's domain tables (incidents / location / weather_hourly)
don't exist in the driver's testdata, so for oracle-checkable
end-to-end runs we derive them deterministically from ``events``:
every derivation below is a pure column expression with an exact
DuckDB-SQL twin (see __spark_entry__.py), which lets the driver verify
the ENTIRE pipeline DAG — parse, dedup, EMSSTAT window, ranks,
geocode join, bearing math, weather join — against an independent
engine.

Mapping: event_id → incident_num; ts (minute-truncated through the
reference's ``M/d/yyyy H:mm`` round-trip) → incident_ts;
``user_id % 40`` → one of 40 synthetic block addresses;
event_type → nature; event_type='error' → EMSSTAT ORI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import TOWN_CENTER
from enriched_crime_incident_data_pipeline_spark.operators.parallelism import fan_out

N_LOCATIONS = 40


def events_as_incidents_raw(events: DataFrame) -> DataFrame:
    """events → bronze incidents_raw (5 string columns, including the
    reference's non-padded ``M/d/yyyy H:mm`` datetime layout so the
    parse path is genuinely exercised)."""
    events = fan_out(events)
    m = F.col("user_id") % N_LOCATIONS
    return events.select(
        F.date_format("ts", "M/d/yyyy H:mm").alias("datetime_str"),
        F.col("event_id").cast("string").alias("incident_num"),
        F.concat(F.lit("BLK "), m.cast("string"), F.lit(" MAIN ST")).alias(
            "location"
        ),
        F.upper("event_type").alias("nature"),
        F.when(F.col("event_type") == "error", F.lit("EMSSTAT"))
        .otherwise(F.lit("OK0140200"))
        .alias("incident_ori"),
    )


def synthetic_location_dim(events: DataFrame) -> DataFrame:
    """Deterministic geocode-cache dimension: one (loc, lat, lon) per
    synthetic block address, on a grid around TOWN_CENTER so all 8
    compass sides occur."""
    m = (F.col("user_id") % N_LOCATIONS).alias("m")
    base = events.select(m).distinct()
    lat0, lon0 = TOWN_CENTER
    return base.select(
        F.concat(F.lit("BLK "), F.col("m").cast("string"), F.lit(" MAIN ST")).alias(
            "loc"
        ),
        (F.lit(lat0) + (F.col("m") - 20).cast("double") * 0.01).alias("latitude"),
        (
            F.lit(lon0)
            + ((F.col("m") * 7) % N_LOCATIONS - 20).cast("double") * 0.0125
        ).alias("longitude"),
        F.lit(None).cast("int").alias("weather"),
    )


def synthetic_weather_hourly(incidents_with_coords: DataFrame) -> DataFrame:
    """Deterministic hourly weather lookup covering exactly the
    pipeline's work-list: code = (day-of-month·24 + hour) mod 100."""
    return (
        incidents_with_coords.filter(
            F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
        )
        .select(
            "latitude",
            "longitude",
            F.to_date("incident_ts").alias("date"),
            F.hour("incident_ts").alias("hour"),
        )
        .distinct()
        .withColumn(
            "weather_code",
            ((F.dayofmonth("date") * 24 + F.col("hour")) % 100).cast("int"),
        )
    )
