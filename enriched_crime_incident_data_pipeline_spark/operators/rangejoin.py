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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    l_lo: str,
    l_hi: str,
    r_id: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-OVERLAP join (interval × interval — the shape
    `range_join`'s point-in-interval cannot express): all pairs whose
    closed intervals intersect, i.e. ``l_lo ≤ r_hi AND r_lo ≤ l_hi``.

    Each side explodes its interval over the fixed-width buckets it
    covers and the join is an equi-join on the bucket (hash join,
    never a nested loop). An overlapping pair shares EVERY bucket
    covering its overlap, so instead of a dedup shuffle the pair is
    attributed to exactly one bucket — the one containing the overlap
    start, ``floor(greatest(l_lo, r_lo) / w)`` — a pure residual
    predicate. Shuffle volume is Σ interval_len/w + |rows| per side;
    pick ``bucket_width`` near the typical interval length so the
    explode factor stays small. Returns both ids and
    ``overlap_len = least(hi) - greatest(lo)``.

    Bounds are integers (epoch seconds for time intervals — callers
    convert), keeping bucket math and the residual exact.
    """
    def buckets(lo, hi):
        return F.sequence(
            F.floor(F.col(lo) / bucket_width),
            F.floor(F.col(hi) / bucket_width),
        )

    l = left.select(
        F.col(l_id).alias("_lid"),
        F.col(l_lo).alias("_llo"),
        F.col(l_hi).alias("_lhi"),
        F.explode(buckets(l_lo, l_hi)).alias("_bucket"),
    )
    r = right.select(
        F.col(r_id).alias("_rid"),
        F.col(r_lo).alias("_rlo"),
        F.col(r_hi).alias("_rhi"),
        F.explode(buckets(r_lo, r_hi)).alias("_bucket"),
    )
    start = F.greatest(F.col("_llo"), F.col("_rlo"))
    return (
        l.join(r, "_bucket")
        .filter(
            (F.col("_llo") <= F.col("_rhi"))
            & (F.col("_rlo") <= F.col("_lhi"))
            & (F.col("_bucket") == F.floor(start / bucket_width))
        )
        .select(
            F.col("_lid").alias(l_id),
            F.col("_rid").alias(r_id),
            (
                F.least(F.col("_lhi"), F.col("_rhi")) - start
            ).cast("bigint").alias("overlap_len"),
        )
    )
