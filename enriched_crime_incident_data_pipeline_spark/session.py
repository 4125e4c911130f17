"""SparkSession factory.

Local-mode defaults are tuned for the test/bench environment
(single JVM, many cores); the same builder settings are what we would
ship on a real cluster: AQE on (runtime re-planning, skew-join
handling, partition coalescing), UTC session timezone (parity with the
DuckDB oracle and with the reference's naive timestamps), Arrow
enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "enriched_crime_incident_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-sane defaults.

    ``shuffle_partitions`` defaults to the local core count — the
    right size for local runs; on a real cluster leave AQE's
    coalescing to right-size post-shuffle partitions from the
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``
    ceiling instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r10 (guide §3.1/§9): allow shuffled-hash join where the
        # per-partition build side fits — skips the sort both sides of
        # a sort-merge pay. The AQE threshold bounds the build-side
        # partition at 64 MB (measured post-shuffle, after AQE
        # coalescing), so the OOM risk SMJ exists to avoid is capped;
        # interleaved A/B over the join-heavy bench entries: −2.6%
        # total, no regression beyond noise. Join RESULTS are
        # strategy-independent; full selfcheck re-verified 360/360.
        # CAVEAT (ADVICE r10): preferSortMergeJoin=false also steers
        # the STATIC planner, which picks shuffled-hash from size
        # ESTIMATES — a badly misestimated or skewed build side can
        # OOM where sort-merge would spill. The AQE threshold below
        # bounds only the AQE conversion path. On a cluster whose
        # stats are unreliable, drop this line and keep the AQE
        # threshold alone (runtime sizes, bounded build side).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
