"""Bearing + compass bucketing (reference src/enrich/geography.py:9-41),
including the 22.5° bucket boundaries and half-even rounding parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import TOWN_CENTER
from enriched_crime_incident_data_pipeline_spark.functions.geography import (
    bearing_degrees,
    compass_bucket,
    compass_bucket_half_even,
    side_of_town_col,
)


def _py_bearing(lat: float, lon: float) -> float:
    # independent reimplementation of the reference formula
    # (src/enrich/geography.py:27-35) for cross-checking
    lat1, lon1 = map(math.radians, TOWN_CENTER)
    lat2, lon2 = math.radians(lat), math.radians(lon)
    dlon = lon2 - lon1
    x = math.cos(lat2) * math.sin(dlon)
    y = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(lat2) * math.cos(dlon)
    return (math.degrees(math.atan2(x, y)) + 360) % 360


@pytest.mark.parametrize(
    "dlat,dlon,expected",
    [
        (0.1, 0.0, "N"),
        (0.1, 0.12, "NE"),
        (0.0, 0.1, "E"),
        (-0.1, 0.12, "SE"),
        (-0.1, 0.0, "S"),
        (-0.1, -0.12, "SW"),
        (0.0, -0.1, "W"),
        (0.1, -0.12, "NW"),
    ],
)
def test_all_eight_sides(spark, dlat, dlon, expected):
    lat, lon = TOWN_CENTER[0] + dlat, TOWN_CENTER[1] + dlon
    df = spark.createDataFrame([(lat, lon)], "latitude double, longitude double")
    row = df.select(
        side_of_town_col(F.col("latitude"), F.col("longitude")).alias("side"),
        bearing_degrees(F.col("latitude"), F.col("longitude")).alias("b"),
    ).collect()[0]
    assert row["side"] == expected
    # Spark column math agrees with the python reference formula
    assert row["b"] == pytest.approx(_py_bearing(lat, lon), abs=1e-9)


def test_null_coordinates_give_null_side(spark):
    # reference skips NULL-coordinate rows (geography.py:23-25)
    df = spark.createDataFrame(
        [(None, None)], "latitude double, longitude double"
    )
    row = df.select(
        side_of_town_col(F.col("latitude"), F.col("longitude")).alias("side")
    ).collect()[0]
    assert row["side"] is None


@pytest.mark.parametrize(
    "bearing,floor_bucket,half_even_bucket",
    [
        # exact 22.5°+k·45° boundaries: floor formulation always takes
        # the next bucket (half-up); Python round() is half-even —
        # 22.5/45=0.5 → round 0 → N, 67.5/45=1.5 → round 2 → E
        (22.5, "NE", "N"),
        (67.5, "E", "E"),
        (112.5, "SE", "E"),   # 2.5 → half-even 2 → E
        (157.5, "S", "S"),    # 3.5 → half-even 4 → S
        (0.0, "N", "N"),
        (44.9, "NE", "NE"),
        (337.5, "N", "N"),    # 7.5 → half-even 8 % 8 = 0 → N
        (359.99, "N", "N"),
    ],
)
def test_bucket_boundaries(spark, bearing, floor_bucket, half_even_bucket):
    df = spark.createDataFrame([(bearing,)], "b double")
    row = df.select(
        compass_bucket(F.col("b")).alias("f"),
        compass_bucket_half_even(F.col("b")).alias("he"),
    ).collect()[0]
    assert row["f"] == floor_bucket
    # half-even variant pins Python round() parity
    # (reference src/enrich/geography.py:36)
    assert row["he"] == half_even_bucket
