"""Parquet catalog over the driver testdata directories.

``spark.read.parquet`` gives columnar scans with predicate pushdown
and column pruning; at cluster scale the same loader points at
date-partitioned table roots and Catalyst prunes partitions from the
query predicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS), which Spark only reads
# via the nanosAsLong legacy conf; converted back to (micro-precision)
# timestamps on load. DuckDB applies the same ns→µs truncation, so the
# oracle sees identical values.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (see TESTDATA.md)."""
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nanos_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
