"""Report-URL classification / date extraction / watermark cutoff
(reference src/scrape/normanpd.py:12-69,
tests/test_pipeline_minimal.py:45-58)."""

from __future__ import annotations

import datetime as dt

from enriched_crime_incident_data_pipeline_spark.sources.urls import (
    classify_report_urls,
    new_incident_urls,
)

URLS = [
    ("/sites/default/files/documents/2024-04/2024-04-03_daily_incident_summary.pdf",),
    ("/sites/default/files/documents/2024-04/2024-04-04_daily_incident_summary.pdf",),
    ("/sites/default/files/documents/2024-04/2024-04-04_daily_incident_summary.pdf",),  # dup
    ("/sites/default/files/documents/2024-04/2024-04-03_daily_case_summary.pdf",),
    ("/sites/default/files/documents/2024-04/2024-04-03_daily_arrest_summary.pdf",),
    ("/about-us/contact",),  # no date, no kind
]


def test_classify_and_dedup(spark):
    df = spark.createDataFrame(URLS, "href string")
    out = classify_report_urls(df)
    assert out.count() == 5  # set() dedup parity (S3)
    kinds = {r["href"]: r["report_kind"] for r in out.collect()}
    assert kinds[URLS[0][0]] == "incident"
    assert kinds[URLS[3][0]] == "case"
    assert kinds[URLS[4][0]] == "arrest"
    assert kinds["/about-us/contact"] is None
    dates = {r["href"]: r["report_date"] for r in out.collect()}
    assert dates[URLS[0][0]] == dt.date(2024, 4, 3)
    assert dates["/about-us/contact"] is None


def test_new_incident_urls_strict_watermark(spark):
    df = spark.createDataFrame(URLS, "href string")
    out = new_incident_urls(df, dt.date(2024, 4, 3))
    assert [r["report_date"] for r in out.collect()] == [dt.date(2024, 4, 4)]
    # empty DB → everything incident-kind flows through
    assert new_incident_urls(df, None).count() == 2
