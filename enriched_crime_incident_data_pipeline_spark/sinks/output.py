"""Output sinks (reference §2 S8/S9/P1).

The documented output contract is the 9-column projection
(/root/reference/src/pipeline/main.py:22-30, TECHNICAL.md:32); the CSV
export is ``SELECT *`` (src/pipeline/temp.py:9-28).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

# P1 projection order — src/pipeline/main.py:22-30
OUTPUT_COLUMNS = [
    "day_of_week",
    "time_of_day",
    "weather",
    "location",
    "location_rank",
    "side_of_town",
    "incident_rank",
    "nature",
    "emsstat",
]


def gold_projection(incidents: DataFrame) -> DataFrame:
    """The 9-column report projection (drops the keys)."""
    return incidents.select(*OUTPUT_COLUMNS)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export (S9). ``single_file`` coalesces for small exports —
    never at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_tsv_stdout(df: DataFrame, limit: int = 1000) -> None:
    """TSV-to-stdout parity sink (S8). Driver-side by design — it is a
    human-facing report, capped."""
    cols = df.columns
    sys.stdout.write("\t".join(cols) + "\n")
    for row in df.limit(limit).collect():
        sys.stdout.write(
            "\t".join("" if row[c] is None else str(row[c]) for c in cols) + "\n"
        )


def write_incidents_partitioned(incidents: DataFrame, path: str) -> None:
    """Gold-table layout for scale: parquet partitioned by incident
    date (hive-style ``incident_date=YYYY-MM-DD/`` directories).

    This is the storage-side replacement for the reference's B-tree
    indexes on ``incident_num``/``incident_ts``
    (src/db/schema.py:25-26): the watermark read (``MAX(incident_ts)``)
    and any date-range predicate become partition pruning — Catalyst
    lists only the matching directories, so a one-day query over a
    100 TB table reads one day, not 100 TB.
    """
    from pyspark.sql import functions as F

    (
        incidents.withColumn("incident_date", F.to_date("incident_ts"))
        .write.mode("overwrite")
        .partitionBy("incident_date")
        .parquet(path)
    )


def read_incidents_partitioned(spark, path: str) -> DataFrame:
    """Load the partitioned gold table; date predicates prune
    partitions (verify with ``.explain``'s ``PartitionFilters``)."""
    return spark.read.parquet(path)


def write_compacted(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    max_records_per_file: int,
    n_partitions: int | None = None,
) -> None:
    """Small-files-aware compacting writer: range-repartition on
    ``order_cols``, sort within partitions, and cap records per file.

    At 100 TB the small-files problem (and its opposite — one giant
    unsplittable file) dominates scan cost: this layout yields
    bounded, evenly-sized files whose parquet min/max column stats
    are tight on ``order_cols`` (range partitioning makes each file
    own a narrow key range), so later scans with predicates on those
    columns skip whole files. ``maxRecordsPerFile`` bounds file size
    without an extra shuffle.
    """
    from pyspark.sql import functions as F  # noqa: F401  (parity with module style)

    parts = df.repartitionByRange(*(([n_partitions] if n_partitions else []) + order_cols))
    (
        parts.sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
