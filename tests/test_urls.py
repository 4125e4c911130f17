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


def test_report_pages_python_datasource(spark, tmp_path):
    """S1 as a first-class Spark source: the Python DataSource scans
    HTML page snapshots (one partition per file, executor-side href
    extraction) and feeds the declarative classify/watermark chain."""
    from enriched_crime_incident_data_pipeline_spark.sources.report_pages import (
        register_report_pages,
    )

    page1 = tmp_path / "reports_2024-04.html"
    page1.write_text(
        """<html><body>
        <a href="/sites/default/files/documents/2024-04/2024-04-03_daily_incident_summary.pdf">Apr 3</a>
        <a class=x HREF='/sites/default/files/documents/2024-04/2024-04-04_daily_incident_summary.pdf'>Apr 4</a>
        <a href="/sites/default/files/documents/2024-04/2024-04-03_daily_case_summary.pdf">case</a>
        <a href="/about-us/contact">contact</a>
        <link href="/styles.css"/>
        </body></html>"""
    )
    page2 = tmp_path / "reports_2024-05.html"
    page2.write_text(
        '<a href="/sites/default/files/documents/2024-05/2024-05-01_daily_arrest_summary.pdf">May 1</a>'
    )

    register_report_pages(spark)
    pages = (
        spark.read.format("report_pages")
        .option("path", str(tmp_path / "reports_*.html"))
        .load()
    )
    # one partition per matched page file
    assert pages.rdd.getNumPartitions() == 2
    assert pages.count() == 6  # every href attribute, both quote styles

    classified = classify_report_urls(pages)
    kinds = {
        r["report_kind"]
        for r in classified.filter("report_kind IS NOT NULL").collect()
    }
    assert kinds == {"incident", "case", "arrest"}

    # chains into the S2 strict-> watermark cutoff unchanged
    fresh = new_incident_urls(pages, dt.date(2024, 4, 3))
    assert [r["report_date"] for r in fresh.collect()] == [dt.date(2024, 4, 4)]
