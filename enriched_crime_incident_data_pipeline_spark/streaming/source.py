"""Streaming sources over the parquet testdata.

File-source streams need an explicit schema; we take it from a batch
read of the same path so the stream sees exactly what the batch
engine sees (`events.ts` is normalized to micro-precision
TimestampType exactly as in ``sources.catalog.load_table``,
whichever physical parquet type the testdata generation used).

Scale: a file-source stream with ``Trigger.AvailableNow`` +
checkpointing is the exactly-once replacement for the reference's
MAX(incident_ts) watermark pruning
(`/root/reference/src/scrape/normanpd.py:23-27`) — the checkpoint
tracks processed files, so re-runs pick up only new report files, and
`maxFilesPerTrigger` bounds per-batch state on a 1000-executor
backfill.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events.parquet as a streaming DataFrame (ts converted from
    stored nanos to micro-precision timestamps, as in the batch
    loader)."""
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the file source streams *directories* (new files appear, the
    # checkpoint tracks which were seen); the testdata table is a bare
    # file, so stage a symlink under a per-sf scratch dir — the same
    # shape a live feed has, one parquet file per arriving report
    stage = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.strip(os.sep).replace(os.sep, "_"),
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage)
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        as_micros_timestamp,
    )

    return df.withColumn("ts", as_micros_timestamp(df, "ts"))


def stream_incidents_raw(spark: SparkSession, bronze_dir: str) -> DataFrame:
    """Bronze incidents_raw directory (5 string columns) as a stream —
    the live-ingest shape: each daily report lands as one new file and
    the checkpoint makes reprocessing exactly-once."""
    from enriched_crime_incident_data_pipeline_spark.schemas import INCIDENTS_RAW_SCHEMA

    return spark.readStream.schema(INCIDENTS_RAW_SCHEMA).parquet(bronze_dir)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Any testdata table as a streaming DataFrame via the same
    staged-symlink file source ``stream_events`` uses (one parquet
    file per "arriving" batch, checkpoint-tracked)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    stage = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_stream",
        sf_dir.strip(os.sep).replace(os.sep, "_") + f"_{name}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{name}.parquet")
    # lexists, not exists: exists() follows the symlink, so a stale
    # link whose target was moved/recreated reads as "absent" and the
    # re-create raises FileExistsError instead of repairing the stage
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(path):
            os.unlink(link)
            os.symlink(path, link)
    else:
        os.symlink(path, link)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage)
