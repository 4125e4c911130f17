"""Bucketed range (interval) join — value-in-range joins without an
equi-key.

The reference has equi-joins only (SURVEY.md §2.3); real pipelines
also need "probe value ∈ [lo, hi)" joins (IP→geo tables, price
bands, time-validity windows without a shared key). Spark's only
native plan for a pure theta predicate is BroadcastNestedLoopJoin —
O(|ranges|·|probes|) compares and broadcast-only.

The scale-correct formulation makes the join an equi-join on a
derived key: quantize the value axis into width-``w`` buckets,
explode every range into the buckets it covers, tag each probe with
its bucket, hash-join on the bucket id, then apply the exact
``lo <= v < hi`` residual filter. Cost: shuffle of
(|ranges|·avg_span/w + |probes|) rows — tunable via ``w``, no
cartesian blowup, and both sides partition/parallelize like any
equi-join. Pick ``w`` near the typical range width so each range
explodes to O(1) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    ranges: DataFrame,
    probes: DataFrame,
    lo: Column,
    hi: Column,
    value: Column,
    bucket_width: float,
) -> DataFrame:
    """Inner join of ``probes`` to every range with
    ``lo <= value < hi``, as bucket-equi-join + residual filter.

    Returns all columns of both inputs (names must not collide).
    """
    w = F.lit(float(bucket_width))
    rb = ranges.withColumn("_lo", lo).withColumn("_hi", hi).withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(F.col("_lo") / w), F.floor(F.col("_hi") / w))),
    )
    pb = probes.withColumn("_v", value).withColumn(
        "_bucket", F.floor(F.col("_v") / w)
    )
    return (
        pb.join(rb, "_bucket")
        .filter((F.col("_v") >= F.col("_lo")) & (F.col("_v") < F.col("_hi")))
        .drop("_bucket", "_lo", "_hi", "_v")
    )
