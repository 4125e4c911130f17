"""Bucketed table layout: shuffle-free co-located joins.

Broadcast covers every dimension join in this engine, but a
fact-to-fact equi-join (lineitem⋈orders, incidents⋈incidents-history)
shuffles both sides on the key every time. Bucketing pre-shuffles
once at write: both tables hashed into the same number of buckets on
the join key mean Catalyst plans the join with zero Exchange on
either side — at 100 TB that converts an every-query shuffle of the
whole fact table into a one-time layout cost.

``sortBy`` within buckets additionally removes the per-query Sort
under a sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_within: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``key``. ``table`` may be ``database.name``."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    )
    if sort_within:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
