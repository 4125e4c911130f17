"""Binary (PDF) ingestion plumbing (reference §2 S4/S5/U4).

The reference downloads each report PDF into memory and parses the
fixed-layout incident table with PyMuPDF
(/root/reference/src/pdf/fetch_incidents.py:7-17,
src/pdf/parse_incidents.py:23-65). PyMuPDF is not in this container,
so the *decode* step is stubbed — but the Spark-side plumbing is real:
``binaryFile`` source → Arrow-batched ``mapInPandas`` over the binary
``content`` column → exploded bronze rows in INCIDENTS_RAW_SCHEMA.
Swap ``parse_pdf_bytes`` for a real PyMuPDF implementation and nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BRONZE_DDL = (
    "path string, datetime_str string, incident_num string, "
    "location string, nature string, incident_ori string"
)


def parse_pdf_bytes(content: bytes) -> list[tuple[str, str, str, str, str]]:
    """Decode one PDF into 5-field incident rows.

    STUB: PyMuPDF is unavailable in this environment. The real
    implementation mirrors parse_incidents.py:23-65 (text blocks per
    page, drop page-0 header + trailers, split on newline, pad/merge
    to 5 fields — the pad/merge itself is implemented engine-side in
    ``operators.normalize``).
    """
    raise NotImplementedError(
        "PDF decode requires PyMuPDF; provide rows via the bronze "
        "fixture path or install a decoder."
    )


def read_pdf_binary(spark: SparkSession, path_glob: str) -> DataFrame:
    """``binaryFile`` scan: one row per PDF with (path, length,
    content). Spark parallelizes across files; each file's bytes stay
    on one executor."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path_glob)
    )


def pdf_to_bronze(binary_df: DataFrame, parser=None) -> DataFrame:
    """binary rows → bronze incident rows via Arrow-batched
    ``mapInPandas`` (one Python decode per file, vectorized exchange).

    ``parser(content: bytes) -> list[5-tuple]`` defaults to the
    (stubbed) PyMuPDF decoder; tests inject a deterministic fake so
    the distributed plumbing — binaryFile scan, Arrow batch shape,
    per-file row explosion, bronze schema — is exercised for real."""
    parse = parser or parse_pdf_bytes

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out: list[dict] = []
            for path, content in zip(pdf_batch["path"], pdf_batch["content"]):
                for row in parse(content):
                    out.append(
                        {
                            "path": path,
                            "datetime_str": row[0],
                            "incident_num": row[1],
                            "location": row[2],
                            "nature": row[3],
                            "incident_ori": row[4],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "datetime_str",
                    "incident_num",
                    "location",
                    "nature",
                    "incident_ori",
                ],
            )

    return binary_df.select("path", "content").mapInPandas(decode, BRONZE_DDL)
