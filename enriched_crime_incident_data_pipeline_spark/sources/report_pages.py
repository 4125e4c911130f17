"""Custom Python DataSource for the report-page link scan
(reference §2 S1, /root/reference/src/scrape/normanpd.py:12-69).

The reference GETs the department-activity-reports page and walks
every ``<a href>`` with BeautifulSoup on the driver. Here the scan is
a first-class Spark source (the Spark 4 Python DataSource API): each
page file is one input partition, href extraction runs on executors,
and the result is a DataFrame that flows straight into the
declarative classify/watermark operators (``sources/urls.py``).

Hermetic by design: the source reads page snapshots from local files
(the test fixture is a saved HTML page), never the network — live
fetching belongs in a driver-side step that writes snapshots, keeping
engine correctness independent of HTTP (same boundary the engine
draws for PDFs, geocoding, and weather).

Scale: one partition per page file — the reports page is one file
today, but a 100 TB-era crawl snapshot directory (*.html across
dates) fans out one executor task per page with no driver loop.
"""

from __future__ import annotations

import glob
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# href="..." / href='...' attribute values, any tag, case-insensitive.
# A regex is deliberately sufficient here: the scan only needs anchor
# targets, and the downstream rlike classification rejects non-report
# hrefs — parity with the reference's soup.find_all('a', href=True).
_HREF_RE = re.compile(r"""href\s*=\s*["']([^"']+)["']""", re.IGNORECASE)


class ReportPageDataSource(DataSource):
    """``spark.read.format("report_pages").load(path)`` → one row per
    href found in each matched HTML file: ``href, page_file``."""

    @classmethod
    def name(cls) -> str:
        return "report_pages"

    def schema(self) -> str:
        return "href string, page_file string"

    def reader(self, schema) -> "ReportPageReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("report_pages source requires a path")
        return ReportPageReader(path)


class ReportPageReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self._path = path

    def partitions(self) -> list[InputPartition]:
        # driver-side listing only (cheap); one partition per page file
        files = sorted(glob.glob(self._path)) or [self._path]
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        page_file = partition.value
        with open(page_file, encoding="utf-8", errors="replace") as fh:
            html = fh.read()
        for href in _HREF_RE.findall(html):
            yield href, page_file


def register_report_pages(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(ReportPageDataSource)


def fetch_snapshot(url: str, dest_path: str, timeout_s: float = 10.0) -> str:
    """The driver-side live-fetch step this module's docstring draws
    the boundary at: GET ``url`` (stdlib urllib, reference
    normanpd.py:12-30 / parse_incidents.py fetch) and write the raw
    bytes to ``dest_path`` — HTML page snapshots for this source,
    PDF bytes for the binaryFile scan alike. Engine correctness
    stays independent of HTTP; this is the only place page/report
    bytes enter from the network. Returns ``dest_path``."""
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": "spark-crime-enrich/1.0"}
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        data = resp.read()
    with open(dest_path, "wb") as fh:
        fh.write(data)
    return dest_path
