"""Datetime derivations (reference §2.7 F1-F6).

All built-in: ``to_timestamp`` / ``dayofweek`` / ``hour`` /
``regexp_extract`` — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import (
    RAW_TIMESTAMP_FORMAT,
    URL_DATE_PATTERN,
)


def parse_incident_ts(datetime_str: Column) -> Column:
    """`"1/2/2026 0:03"` → timestamp. Single-digit month/day/hour
    layout parity with reference src/db/incidents.py:33-34
    (``%m/%d/%Y %H:%M`` with non-padded values). ``try_`` variant:
    unparseable strings yield NULL (surfaced by health metrics)
    instead of failing the batch under ANSI mode."""
    return F.try_to_timestamp(datetime_str, F.lit(RAW_TIMESTAMP_FORMAT))


def day_of_week(ts: Column) -> Column:
    """1=Sunday … 7=Saturday. Spark's ``dayofweek`` builtin already
    uses the reference's recode
    (src/pdf/parse_incidents.py:9-20: ``((weekday()+1) % 7) + 1``)."""
    return F.dayofweek(ts)


def hour_of_day(ts: Column) -> Column:
    """Hour 0-23 (reference src/db/incidents.py:25:
    ``int(time.split(':')[0])``)."""
    return F.hour(ts)


def url_report_date(href: Column) -> Column:
    """Extract the YYYY-MM-DD report date embedded in a report URL
    (reference src/scrape/normanpd.py:41-42). Hrefs without a date
    yield NULL (empty regexp_extract → to_date NULL)."""
    extracted = F.regexp_extract(href, URL_DATE_PATTERN, 0)
    return F.to_date(F.when(extracted != "", extracted))
