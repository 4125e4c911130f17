"""Source-layer robustness: schema evolution across parquet writes
and malformed-record capture on text ingestion — the Spark-native
answers to the reference's positional row patching
(src/pdf/parse_incidents.py:49-56, cited in SURVEY.md S5/F9)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parquet_merge_schema_unions_columns(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, nature string"
    ).write.parquet(path + "/batch=1")
    # later batch adds an enrichment column (schema evolution)
    spark.createDataFrame(
        [(2, "b", 3)], "id long, nature string, weather int"
    ).write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "nature", "weather", "batch"}
    rows = {r["id"]: r["weather"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 3


def test_permissive_csv_captures_corrupt_rows(spark, tmp_path):
    raw = tmp_path / "in.csv"
    raw.write_text("1,ALARM\n2,THEFT\nnot_an_int,X\n3,FRAUD\n")
    df = (
        spark.read.schema("id INT, nature STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(raw))
    )
    df = df.cache()  # corrupt-record column requires a materialized read
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert [r["_corrupt_record"] for r in bad.collect()] == ["not_an_int,X"]
    df.unpersist()


def test_dropmalformed_keeps_only_parseable(spark, tmp_path):
    raw = tmp_path / "in2.csv"
    raw.write_text("1,ALARM\nbad_row_only_one_field\n2,THEFT\n")
    df = (
        spark.read.schema("id INT, nature STRING")
        .option("mode", "DROPMALFORMED")
        .csv(str(raw))
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
