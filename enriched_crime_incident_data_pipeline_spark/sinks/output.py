"""Output sinks (reference §2 S8/S9/P1).

The documented output contract is the 9-column projection
(/root/reference/src/pipeline/main.py:22-30, TECHNICAL.md:32); the CSV
export is ``SELECT *`` (src/pipeline/temp.py:9-28).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

# P1 projection order — src/pipeline/main.py:22-30
OUTPUT_COLUMNS = [
    "day_of_week",
    "time_of_day",
    "weather",
    "location",
    "location_rank",
    "side_of_town",
    "incident_rank",
    "nature",
    "emsstat",
]


def gold_projection(incidents: DataFrame) -> DataFrame:
    """The 9-column report projection (drops the keys)."""
    return incidents.select(*OUTPUT_COLUMNS)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export (S9). ``single_file`` coalesces for small exports —
    never at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_tsv_stdout(df: DataFrame, limit: int = 1000) -> None:
    """TSV-to-stdout parity sink (S8). Driver-side by design — it is a
    human-facing report, capped."""
    cols = df.columns
    sys.stdout.write("\t".join(cols) + "\n")
    for row in df.limit(limit).collect():
        sys.stdout.write(
            "\t".join("" if row[c] is None else str(row[c]) for c in cols) + "\n"
        )
