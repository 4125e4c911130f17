"""Deterministic distinct-count sketch (KMV / k-minimum-values).

Approximate aggregates are a core 100 TB capability (billions of
distinct keys don't fit exact state), but the usual implementations
(HLL, ``approx_count_distinct``) are engine-specific and so can't be
oracle-checked. KMV with an md5-derived hash is the exception: the
k smallest distinct hash values — and therefore the estimate
``(k-1) / (kth_smallest / 2^32)`` — are a pure function of the value
set, reproducible bit-for-bit in any engine with md5.

Execution shape: the hash-distinct pass is a groupBy (map-side
combine eats the duplicate mass before the shuffle — for heavy-hitter
distributions the shuffle carries ~one row per distinct per
partition), and the global k-smallest is ``orderBy().limit(k)``,
which Spark executes as TakeOrdered: per-partition partial top-k,
driver-side merge of k·P rows — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import hash32

KMV_K = 256


def kmv_distinct_estimate(df: DataFrame, col: Column, k: int = KMV_K) -> DataFrame:
    """One-row DataFrame ``(k, kth_hash, estimate)`` estimating the
    number of distinct values of ``col``.

    Requires ≥ k distinct values (the estimator's usual regime); with
    fewer the estimate degrades toward the exact count but stays
    deterministic. ``col`` must be a string column (hash the
    canonical string form of whatever you count).
    """
    hashes = df.select(hash32(col).alias("h")).groupBy("h").agg(F.lit(1).alias("_"))
    kmin = hashes.orderBy("h").limit(k)
    return kmin.agg(
        F.count(F.lit(1)).cast("int").alias("k"),
        F.max("h").alias("kth_hash"),
        (
            (F.count(F.lit(1)) - F.lit(1)).cast("double")
            * F.lit(4294967296.0)
            / F.max("h")
        ).alias("estimate"),
    )
