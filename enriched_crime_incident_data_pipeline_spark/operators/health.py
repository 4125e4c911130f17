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


def fd_audit(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Functional-dependency audit for the candidate FD ``lhs → rhs``:
    one row per ``lhs`` value with ``n_rows``, ``n_distinct_rhs``,
    the majority ``rhs`` (``majority_rhs`` — ties break on the lower
    value, so the result is a pure function of the data), and
    ``n_violations`` = rows that would need repair to make the FD
    hold (``n_rows − majority count``) — the standard
    FD-discovery/repair summary a data-quality sweep publishes.

    Shape: one ``(lhs, rhs)`` count aggregation (map-side combinable)
    followed by a per-``lhs`` reduce over the distinct-pair relation
    — the second aggregate sees one row per distinct pair, never the
    raw table. Everything is integer counts and comparisons:
    bit-exact cross-engine."""
    pair = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("_c"))
    return (
        pair.groupBy(lhs)
        .agg(
            F.sum("_c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_rhs"),
            F.min_by(
                rhs, F.struct((-F.col("_c")).alias("nc"), F.col(rhs))
            ).alias("majority_rhs"),
            (F.sum("_c") - F.max("_c")).cast("bigint").alias("_nv_min"),
        )
        .withColumnRenamed("_nv_min", "n_violations")
    )
