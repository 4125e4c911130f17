"""Source/sink format breadth: parquet is the engine's primary
format; ORC, JSON-lines, and CSV round-trip with schema fidelity
(the reference's only sinks were TSV stdout and CSV — SURVEY.md
S8/S9; an engine replacing it needs the full format matrix)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

ROWS = [
    (1, "ALARM", 2.5, dt.datetime(2026, 1, 2, 0, 3)),
    (2, "THEFT", None, dt.datetime(2026, 1, 2, 12, 30)),
    (3, None, 7.0, None),
]
SCHEMA = "id long, nature string, score double, ts timestamp"


def _assert_round_trip(df, back):
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_round_trip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "t.orc")
    df.write.orc(p)
    _assert_round_trip(df, spark.read.orc(p))


def test_json_lines_round_trip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "t.json")
    df.write.json(p)
    # JSON is schemaless on disk: reading back with the explicit
    # schema restores types (schema-on-read, as the bronze layer does)
    _assert_round_trip(df, spark.read.schema(SCHEMA).json(p))


def test_csv_round_trip_with_header(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = str(tmp_path / "t.csv")
    df.write.option("header", True).csv(p)
    back = spark.read.schema(SCHEMA).option("header", True).csv(p)
    _assert_round_trip(df, back)


def test_partitioned_parquet_moves_column_to_path(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "day", F.to_date("ts")
    )
    p = str(tmp_path / "part")
    df.write.partitionBy("day").parquet(p)
    back = spark.read.parquet(p)
    # partition column round-trips through directory names (null day
    # lands in the __HIVE_DEFAULT_PARTITION__ directory)
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]
    assert back.filter(F.col("day").isNull()).count() == 1


def test_managed_table_catalog_round_trip(spark, tmp_path):
    """S10 DDL parity: CREATE TABLE IF NOT EXISTS via the catalog —
    saveAsTable + catalog API + idempotent re-create."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS cat_t LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        df = spark.createDataFrame(ROWS, SCHEMA)
        df.write.saveAsTable("cat_t.incidents")
        # IF NOT EXISTS: second create is a no-op, not an error
        spark.sql(
            "CREATE TABLE IF NOT EXISTS cat_t.incidents (id LONG) USING parquet"
        )
        assert spark.catalog.tableExists("cat_t.incidents")
        cols = {c.name for c in spark.catalog.listColumns("cat_t.incidents")}
        assert cols == {"id", "nature", "score", "ts"}
        back = spark.table("cat_t.incidents")
        assert back.count() == 3
        # append stays idempotent-friendly: same schema enforced
        df.write.mode("append").saveAsTable("cat_t.incidents")
        assert spark.table("cat_t.incidents").count() == 6
    finally:
        spark.sql("DROP DATABASE IF EXISTS cat_t CASCADE")

