"""Report-URL discovery operators (reference §2 S1/S2/S3/P6/F6/F12).

The reference scrapes the Norman PD reports page and regex-classifies
hrefs into incident / case / arrest daily-report URLs
(/root/reference/src/scrape/normanpd.py:12-69). The HTTP fetch is a
driver-side discovery step; everything after it — classify, dedup,
date-extract, watermark cutoff — is declarative and lives here.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import (
    ARREST_URL_PATTERN,
    CASE_URL_PATTERN,
    INCIDENT_URL_PATTERN,
)
from enriched_crime_incident_data_pipeline_spark.functions.datetime_fns import (
    url_report_date,
)
from enriched_crime_incident_data_pipeline_spark.operators.watermark import (
    filter_after_watermark,
)


def classify_report_urls(urls: DataFrame, href_col: str = "href") -> DataFrame:
    """Trim + classify + dedup hrefs.

    Output: ``href, report_kind (incident|case|arrest|NULL),
    report_date``. Regex parity with normanpd.py:33-35; dedup parity
    with the set() accumulation (S3)."""
    href = F.trim(F.col(href_col))
    kind = (
        F.when(href.rlike(INCIDENT_URL_PATTERN), F.lit("incident"))
        .when(href.rlike(CASE_URL_PATTERN), F.lit("case"))
        .when(href.rlike(ARREST_URL_PATTERN), F.lit("arrest"))
    )
    return (
        urls.select(
            href.alias("href"),
            kind.alias("report_kind"),
            url_report_date(href).alias("report_date"),
        )
        .distinct()
    )


def new_incident_urls(urls: DataFrame, watermark: dt.date | None) -> DataFrame:
    """Incident-report URLs strictly after the watermark date (S2
    strict-``>`` semantics, normanpd.py:43) — the incremental batch
    work-list."""
    classified = classify_report_urls(urls)
    incident = classified.filter(F.col("report_kind") == "incident")
    return filter_after_watermark(incident, "report_date", watermark)
