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



def test_analyze_table_stats_feed_the_optimizer(spark, tmp_path):
    """Table/column statistics surface (the CBO input the reference
    delegated to Postgres' planner): ANALYZE TABLE populates
    size+rowCount and per-column NDV/min/max in the catalog, and the
    optimizer's cardinality estimate for the analyzed scan equals the
    true row count (i.e. stats are consumed, not just stored)."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS cat_s LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        spark.createDataFrame(
            [(i, i % 7, f"n{i % 13}") for i in range(1000)],
            "id long, grp long, name string",
        ).write.saveAsTable("cat_s.facts")
        spark.sql("ANALYZE TABLE cat_s.facts COMPUTE STATISTICS")
        spark.sql(
            "ANALYZE TABLE cat_s.facts COMPUTE STATISTICS"
            " FOR COLUMNS id, grp"
        )

        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESC EXTENDED cat_s.facts").collect()
        }
        assert "Statistics" in detail
        assert "1000 rows" in detail["Statistics"]

        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESC EXTENDED cat_s.facts grp"
            ).collect()
        }
        assert col["distinct_count"] == "7"
        assert col["min"] == "0" and col["max"] == "6"

        # the optimizer consumes the stats: with CBO on, the scan's
        # estimated row count is exact
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            plan = spark.table("cat_s.facts")._jdf.queryExecution()
            row_est = plan.optimizedPlan().stats().rowCount()
            assert row_est.isDefined() and int(str(row_est.get())) == 1000
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
    finally:
        spark.sql("DROP DATABASE IF EXISTS cat_s CASCADE")
