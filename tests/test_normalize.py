"""Pad/merge row normalization parity
(reference src/pdf/parse_incidents.py:47-56)."""

from __future__ import annotations

from pyspark.sql import types as T

from enriched_crime_incident_data_pipeline_spark.operators.normalize import (
    normalize_raw_rows,
)

SCHEMA = T.StructType(
    [T.StructField("fields", T.ArrayType(T.StringType()), True)]
)


def _normalize(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], SCHEMA)
    return normalize_raw_rows(df).collect()


def test_exact_five_fields_positional(spark):
    [row] = _normalize(
        spark, [["1/2/2026 0:03", "2026-1", "123 MAIN ST", "THEFT", "OK014"]]
    )
    assert row["location"] == "123 MAIN ST"
    assert row["nature"] == "THEFT"
    assert row["incident_ori"] == "OK014"


def test_short_row_padded_with_blank_space(spark):
    # <5 fields → location and nature become ' ' (space, NOT null) —
    # parse_incidents.py:51-53
    [row] = _normalize(spark, [["1/2/2026 0:03", "2026-2", "OK014"]])
    assert row["location"] == " "
    assert row["nature"] == " "
    assert row["incident_ori"] == "OK014"


def test_long_row_merges_multiline_location(spark):
    # >5 fields → middle fields concatenated into the location —
    # parse_incidents.py:54-56
    [row] = _normalize(
        spark,
        [["1/2/2026 0:03", "2026-3", "12345 E STATE HIGHWAY 9", "EASTBOUND", "THEFT", "OK014"]],
    )
    assert row["location"] == "12345 E STATE HIGHWAY 9 EASTBOUND"
    assert row["nature"] == "THEFT"
    assert row["incident_ori"] == "OK014"


def test_pdf_binary_to_bronze_plumbing(spark, tmp_path):
    """U4 plumbing with an injected parser: binaryFile scan → Arrow
    mapInPandas → per-file row explosion in the bronze schema."""
    from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
        pdf_to_bronze,
        read_pdf_binary,
    )

    (tmp_path / "2026-01-02_daily_incident_summary.pdf").write_bytes(b"%PDF-A")
    (tmp_path / "2026-01-03_daily_incident_summary.pdf").write_bytes(b"%PDF-BB")

    def fake_parser(content: bytes):
        # rows derived from the bytes, one per byte past the header
        n = len(content) - 5
        return [
            (f"1/2/2026 0:{i:02d}", f"2026-{i:05d}", "MAIN ST", "Theft", "OK0140200")
            for i in range(n)
        ]

    binary = read_pdf_binary(spark, str(tmp_path))
    assert binary.count() == 2
    bronze = pdf_to_bronze(binary, parser=fake_parser)
    rows = bronze.collect()
    assert len(rows) == 3  # 1 row from file A, 2 from file B
    assert set(bronze.columns) == {
        "path", "datetime_str", "incident_num", "location", "nature", "incident_ori"
    }
    assert all(r["location"] == "MAIN ST" for r in rows)
