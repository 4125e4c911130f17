"""Partition-shape helpers.

Small parquet inputs arrive as 1-2 partitions (one per file split);
CPU-heavy per-row derivations (regex tokenize, shingling, hashing)
then run serially no matter how many cores exist. ``fan_out`` inserts
a round-robin repartition ONLY when the input has fewer partitions
than the session's parallelism — on a real cluster with
well-partitioned tables it is a no-op, so it never adds a shuffle at
scale where the shuffle would hurt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session default parallelism when the
    plan's current partitioning is narrower. Streaming DataFrames
    pass through untouched (no ``.rdd`` on streams; micro-batch
    sizing belongs to the source's ``maxFilesPerTrigger``)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
