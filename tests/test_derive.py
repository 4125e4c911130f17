"""Typed-silver derivations: exact-value pins ported from the
reference's unit tests (tests/test_pipeline_minimal.py:22-40) and
parity traps from SURVEY.md §7.4."""

from __future__ import annotations

from datetime import datetime

from enriched_crime_incident_data_pipeline_spark.operators.derive import to_silver
from enriched_crime_incident_data_pipeline_spark.schemas import INCIDENTS_RAW_SCHEMA

RAW_COLS = ["datetime_str", "incident_num", "location", "nature", "incident_ori"]


def _silver(spark, rows):
    df = spark.createDataFrame(rows, INCIDENTS_RAW_SCHEMA)
    return {r["incident_num"]: r for r in to_silver(df).collect()}


def test_timestamp_parse_single_digit_fields(spark):
    # reference src/db/incidents.py:33-34 — "%m/%d/%Y %H:%M" on
    # non-padded strings like "1/2/2026 0:03"
    out = _silver(spark, [("1/2/2026 0:03", "A", "X", "N", "OK")])
    assert out["A"]["incident_ts"] == datetime(2026, 1, 2, 0, 3)
    assert out["A"]["time_of_day"] == 0


def test_day_of_week_encoding_pins(spark):
    # reference tests/test_pipeline_minimal.py:22-34:
    # Monday→2, Sunday→1, Saturday→7 (1=Sunday encoding)
    out = _silver(
        spark,
        [
            ("4/1/2024 10:00", "mon", "X", "N", "OK"),  # 2024-04-01 = Monday
            ("4/7/2024 10:00", "sun", "X", "N", "OK"),  # Sunday
            ("4/6/2024 10:00", "sat", "X", "N", "OK"),  # Saturday
        ],
    )
    assert out["mon"]["day_of_week"] == 2
    assert out["sun"]["day_of_week"] == 1
    assert out["sat"]["day_of_week"] == 7


def test_invalid_datetime_yields_null_ts(spark):
    # reference raises ValueError on bad dates; in the engine a bad
    # string becomes NULL ts (caught downstream by health metrics)
    out = _silver(spark, [("not a date", "B", "X", "N", "OK")])
    assert out["B"]["incident_ts"] is None
    assert out["B"]["day_of_week"] is None


def test_emsstat_flag(spark):
    # reference src/db/incidents.py:27
    out = _silver(
        spark,
        [
            ("1/2/2026 5:30", "e1", "X", "N", "EMSSTAT"),
            ("1/2/2026 5:30", "e2", "X", "N", "OK0140200"),
        ],
    )
    assert out["e1"]["emsstat"] == 1
    assert out["e2"]["emsstat"] == 0


def test_hour_of_day_midnight_and_23(spark):
    out = _silver(
        spark,
        [
            ("1/2/2026 0:03", "h0", "X", "N", "OK"),
            ("1/2/2026 23:59", "h23", "X", "N", "OK"),
        ],
    )
    assert out["h0"]["time_of_day"] == 0
    assert out["h23"]["time_of_day"] == 23
