"""Pandas-UDF parity pins and streaming sketch maintenance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
    cms_counters,
    cms_estimates,
)
from enriched_crime_incident_data_pipeline_spark.functions.text import token_count
from enriched_crime_incident_data_pipeline_spark.functions.udfs import (
    signed_area_expr,
    signed_area_udf,
    token_count_udf,
)
from enriched_crime_incident_data_pipeline_spark.sources import load_table
from enriched_crime_incident_data_pipeline_spark.streaming import stream_events

SF_DIR = "/root/testdata/sf0.001"


def test_pandas_udf_matches_jvm_token_count(spark):
    docs = load_table(spark, SF_DIR, "documents")
    diff = docs.select(
        token_count_udf(F.col("text")).alias("py"),
        token_count(F.col("text")).alias("jvm"),
    ).filter(F.col("py") != F.col("jvm"))
    assert diff.count() == 0


def test_pandas_udf_edge_cases(spark):
    df = spark.createDataFrame(
        [("",), ("  ",), ("one",), ("Hello, World!",), (None,)], "text string"
    )
    out = [r["n"] for r in df.select(token_count_udf("text").alias("n")).collect()]
    assert out == [0, 0, 1, 2, 0]


def test_numeric_pandas_udf_bit_identical_to_expr(spark):
    li = load_table(spark, SF_DIR, "lineitem").limit(5000)
    diff = li.select(
        signed_area_udf(F.col("l_extendedprice"), F.col("l_discount")).alias("py"),
        signed_area_expr(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "jvm"
        ),
    ).filter(F.col("py") != F.col("jvm"))
    # same IEEE op order → exactly equal, not approximately
    assert diff.count() == 0


def _merge_cms_batch(state_dir: str):
    def fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = cms_counters(batch_df, F.col("user_id").cast("string"))
        if os.path.exists(state_dir):
            prev = spark.read.parquet(state_dir)
            merged = (
                prev.unionByName(delta)
                .groupBy("j", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(state_dir + "_next")
        # atomic-ish swap: write next, then replace
        import shutil

        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(state_dir + "_next", state_dir)

    return fn


def test_streaming_cms_merge_equals_batch_sketch(spark, tmp_path):
    """CMS counters are algebraic: per-micro-batch sketches merged by
    cell-wise sum equal the one-shot batch sketch over the whole
    stream — the incremental-maintenance property that lets a 100 TB
    feed keep a live frequency sketch without rescanning history."""
    state = str(tmp_path / "cms_state")
    events = load_table(spark, SF_DIR, "events")

    q = (
        stream_events(spark, SF_DIR)
        .writeStream.foreachBatch(_merge_cms_batch(state))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(state)
    batch = cms_counters(events, F.col("user_id").cast("string"))
    joined = streamed.alias("s").join(
        batch.alias("b"), ["j", "bucket"], "full_outer"
    )
    mismatch = joined.filter(
        F.coalesce(F.col("s.cnt"), F.lit(-1)) != F.coalesce(F.col("b.cnt"), F.lit(-2))
    )
    assert mismatch.count() == 0

    # and the merged sketch answers point queries exactly like batch
    keys = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    keyed = keys.withColumn("key", F.col("user_id").cast("string"))
    est_stream = cms_estimates(keyed, streamed, F.col("key"), "user_id")
    est_batch = cms_estimates(keyed, batch, F.col("key"), "user_id")
    assert sorted(map(tuple, est_stream.collect())) == sorted(
        map(tuple, est_batch.collect())
    )


def test_udtf_word_offsets_equals_relational_twin(spark):
    """The Python UDTF (table function) emits exactly what the
    explode + running-sum-window formulation emits — per-row state in
    Python is interchangeable with the relational hot path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.functions.tablefns import (
        register_word_offsets,
    )

    register_word_offsets(spark)
    docs = spark.createDataFrame(
        [(1, "a bb ccc"), (2, "solo"), (3, None), (4, "x  y")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_udtf_pin_docs")
    got = spark.sql(
        "SELECT doc_id, s.idx, s.word, s.char_offset "
        "FROM _udtf_pin_docs, LATERAL word_offsets(text) s"
    )

    ex = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("idx", "word")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = ex.withColumn(
        "char_offset",
        F.coalesce(F.sum(F.length("word") + 1).over(w), F.lit(0)).cast("int"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # NULL text yields no rows (UDTF returns early, split of NULL is NULL)
    assert got.filter("doc_id = 3").count() == 0
    # consecutive delimiters produce empty words with correct offsets
    assert [
        (r["word"], r["char_offset"])
        for r in got.filter("doc_id = 4").orderBy("idx").collect()
    ] == [("x", 0), ("", 2), ("y", 3)]
