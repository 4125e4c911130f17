"""Incremental high-watermark pruning (reference §2 S2/A3/P5).

The reference reads ``MAX(incident_ts)::date`` and keeps only report
URLs strictly AFTER it, at date granularity
(/root/reference/src/scrape/normanpd.py:23-27,43). Re-runs on the same
day never reprocess that day; key-dedup (operators.dedup) is the
correctness backstop. With date-partitioned storage the same predicate
becomes Catalyst partition pruning for free.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def max_date_watermark(existing: DataFrame, ts_col: str = "incident_ts") -> dt.date | None:
    """``MAX(ts)::date`` of the existing data; None when empty
    (empty table → process everything, normanpd.py:25-27)."""
    row = existing.agg(F.max(F.to_date(ts_col)).alias("wm")).collect()[0]
    return row["wm"]


def filter_after_watermark(
    df: DataFrame, date_col: Column | str, watermark: dt.date | None
) -> DataFrame:
    """Strictly-greater date cutoff; NULL dates are dropped (the
    reference skips URLs with no parseable date,
    normanpd.py:41-43)."""
    col = F.col(date_col) if isinstance(date_col, str) else date_col
    if watermark is None:
        return df.filter(col.isNotNull())
    return df.filter(col > F.lit(watermark))
