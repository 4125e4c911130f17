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


def test_cdc_state_sink_converges_to_batch_fold(spark, tmp_path):
    """CDC state maintenance: three changelog waves streamed one file
    per micro-batch must converge to the same state as one batch fold
    of the whole changelog; tombstones persist across batches."""
    from enriched_crime_incident_data_pipeline_spark.operators.cdc import (
        latest_state,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming.cdc_sink import (
        cdc_state_batch,
        read_state,
    )

    src = tmp_path / "changelog"
    waves = [
        # (key, version, op, value)
        [(1, 1, "upsert", 10.0), (2, 1, "upsert", 20.0)],
        [(1, 2, "delete", 0.0), (3, 1, "upsert", 30.0)],
        # late OLD upsert for deleted key 1 must NOT resurrect it;
        # key 2 updated
        [(1, 0, "upsert", 99.0), (2, 2, "upsert", 25.0)],
    ]
    schema = "k long, v long, op string, value double"
    for i, wave in enumerate(waves):
        spark.createDataFrame(wave, schema).coalesce(1).write.parquet(
            str(src / f"wave{i}.parquet")
        )
        # the file stream lists files, not subdirs: flatten each wave
        # dir's part file up into the source dir
        import glob
        import shutil

        part = glob.glob(str(src / f"wave{i}.parquet" / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"wave{i}.pq"))
        shutil.rmtree(str(src / f"wave{i}.parquet"))

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    args = dict(
        key_cols=["k"],
        version_cols=["v"],
        payload_cols=["op", "value"],
        is_delete=F.col("op") == "delete",
    )

    def run(ckpt):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(cdc_state_batch(state_dir, **args))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt")
    got = {
        r["k"]: (r["op"], r["value"], r["n_changes"])
        for r in read_state(spark, state_dir).collect()
    }
    all_rows = spark.createDataFrame(
        [r for wave in waves for r in wave], schema
    )
    want = {
        r["k"]: (r["op"], r["value"], r["n_changes"])
        for r in latest_state(all_rows, ["k"], ["v"], ["op", "value"],
                              F.col("op") == "delete").collect()
    }
    assert got == want
    assert 1 not in got  # tombstone survived the late older upsert
    assert got[2] == ("upsert", 25.0, 2)

    # same checkpoint → replay is a no-op (exactly-once counters)
    run("ckpt")
    again = {
        r["k"]: (r["op"], r["value"], r["n_changes"])
        for r in read_state(spark, state_dir).collect()
    }
    assert again == want

    # fresh checkpoint re-reads everything: payload converges by
    # value (same winners); only the depth counter double-counts —
    # the documented at-least-once caveat for counters
    run("ckpt2")
    replay = {
        r["k"]: (r["op"], r["value"])
        for r in read_state(spark, state_dir).collect()
    }
    assert replay == {k: (op, val) for k, (op, val, _) in want.items()}
