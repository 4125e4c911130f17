"""Pipeline observability (df.observe) and watermark late-data
semantics — the Spark-native forms of the reference's enrichment
health counts (SURVEY.md P4/A5) and incremental-skip watermark (S2).
"""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import Observation
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.streaming.windows import (
    tumbling_counts,
)


def test_observe_collects_health_metrics_in_one_pass(spark):
    """The reference runs three separate NULL-count SELECTs
    (main.py:108-112); `observe` rides the metrics on the main
    action — zero extra scans."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 5.0), (3, "c", 7.0)],
        "id long, nature string, weather double",
    )
    obs = Observation("health")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("nature").isNull(), 1)).alias("null_nature"),
        F.count(F.when(F.col("weather").isNull(), 1)).alias("null_weather"),
    )
    assert observed.filter(F.col("id") > 0).count() == 3
    got = obs.get
    assert got == {"total": 3, "null_nature": 1, "null_weather": 1}


def _write_batch(spark, dirpath: str, name: str, rows):
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(f"{dirpath}_stage/{name}")
    os.makedirs(dirpath, exist_ok=True)
    part = glob.glob(f"{dirpath}_stage/{name}/part-*.parquet")[0]
    os.replace(part, f"{dirpath}/{name}.parquet")


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    """A row arriving far behind the watermark is excluded from its
    (already finalized) window in append mode — the bounded-state
    contract that lets windowed aggregation run forever at 100 TB."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def run_available(files_ready):
        stream = (
            spark.readStream.schema(
                "ts timestamp, event_type string, value double"
            ).parquet(src)
        )
        q = (
            tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: rows in window [00:00, 00:05) and one 40 min later —
    # the late batch-1 watermark advances to 00:30, finalizing the
    # first window
    _write_batch(
        spark,
        src,
        "b1",
        [
            (t0 + dt.timedelta(minutes=1), "view", 1.0),
            (t0 + dt.timedelta(minutes=2), "view", 2.0),
            (t0 + dt.timedelta(minutes=40), "view", 4.0),
        ],
    )
    run_available(1)
    # batch 2: a VERY late row for the finalized [00:00, 00:05) window
    _write_batch(
        spark,
        src,
        "b2",
        [(t0 + dt.timedelta(minutes=3), "view", 100.0)],
    )
    run_available(2)

    result = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    first = result[(t0, "view")]
    # the late 100.0 row must NOT be in the finalized first window
    assert first == (2, 3.0)
