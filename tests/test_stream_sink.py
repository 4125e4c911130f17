"""Streaming upsert sink: foreachBatch + idempotent append into a
parquet gold table — the production pattern for maintaining a gold
table from an at-least-once feed (each micro-batch is key-deduped
against what's already on disk before appending; the checkpoint makes
replays no-ops).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.sources import load_table
from enriched_crime_incident_data_pipeline_spark.streaming import stream_events

SF_DIR = "/root/testdata/sf0.001"


def _upsert_batch(gold_dir: str):
    from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
        idempotent_append,
    )

    def fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("event_id", "user_id", "event_type", "value")
        if os.path.exists(gold_dir):
            existing = spark.read.parquet(gold_dir)
            fresh = idempotent_append(batch, existing, "event_id")
        else:
            fresh = batch.dropDuplicates(["event_id"])
        fresh.write.mode("append").parquet(gold_dir)

    return fn


def test_foreachbatch_upsert_exactly_once(spark, tmp_path):
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            stream_events(spark, SF_DIR)
            .writeStream.foreachBatch(_upsert_batch(gold))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n_expected = load_table(spark, SF_DIR, "events").count()
    assert spark.read.parquet(gold).count() == n_expected

    # replaying the same source through the same checkpoint adds nothing
    run()
    out = spark.read.parquet(gold)
    assert out.count() == n_expected
    assert out.select("event_id").distinct().count() == n_expected

    # even WITHOUT the checkpoint, the key-dedup upsert is idempotent:
    # a fresh query re-reading everything appends zero new rows
    def run_no_ckpt():
        q = (
            stream_events(spark, SF_DIR)
            .writeStream.foreachBatch(_upsert_batch(gold))
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_no_ckpt()
    assert spark.read.parquet(gold).count() == n_expected
