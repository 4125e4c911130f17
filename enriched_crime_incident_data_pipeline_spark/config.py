"""Engine constants.

TOWN_CENTER mirrors the reference's compass origin
(/root/reference/src/config.py:6): the Norman, OK centroid used by the
side-of-town bearing computation.
"""

from __future__ import annotations

# (latitude, longitude) — reference src/config.py:6
TOWN_CENTER: tuple[float, float] = (35.2226, -97.4395)

# Compass buckets in bearing order, 45° apart starting at North —
# reference src/enrich/geography.py:20
COMPASS_DIRECTIONS: list[str] = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"]

# Timestamp layout of the raw PDF rows — reference src/db/incidents.py:33-34
RAW_TIMESTAMP_FORMAT = "M/d/yyyy H:mm"

# ORI value that marks an EMS-status row — reference src/db/incidents.py:27
EMSSTAT_ORI = "EMSSTAT"

# Report-URL regexes — reference src/scrape/normanpd.py:33-35
INCIDENT_URL_PATTERN = (
    r"/sites/default/files/documents/\d{4}-\d{2}/"
    r"\d{4}-\d{2}-\d{2}_daily_incident_summary\.pdf"
)
CASE_URL_PATTERN = (
    r"/sites/default/files/documents/\d{4}-\d{2}/"
    r"\d{4}-\d{2}-\d{2}_daily_case_summary\.pdf"
)
ARREST_URL_PATTERN = (
    r"/sites/default/files/documents/\d{4}-\d{2}/"
    r"\d{4}-\d{2}-\d{2}_daily_arrest_summary\.pdf"
)
URL_DATE_PATTERN = r"\d{4}-\d{2}-\d{2}"  # reference src/scrape/normanpd.py:41
