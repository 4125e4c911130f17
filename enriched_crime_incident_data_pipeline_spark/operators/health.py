"""Enrichment-health metrics (reference §2 P4/A5/A4).

The reference runs one ``COUNT(*) WHERE col IS NULL`` per column
(/root/reference/src/pipeline/main.py:108-112). Here all the
conditional counts fold into ONE aggregation pass — a single scan at
any scale instead of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_count_health(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: total_rows + null_<col> count per requested column."""
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"null_{c}")
        )
    return df.agg(*aggs)
