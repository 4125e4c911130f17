"""Bronze row normalization (reference §2 S5/F8/F9).

The reference's PDF parser pads rows with <5 fields (blank location +
nature inserted as ``' '`` at positions 2,3) and merges rows with >5
fields (multiline location concatenated) —
/root/reference/src/pdf/parse_incidents.py:47-56. Here the same
normalization runs as column expressions over an
``array<string>`` of raw fields, entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_raw_rows(df: DataFrame, fields_col: str = "fields") -> DataFrame:
    """``fields: array<string>`` (already split on newline, empties
    removed — F8) → the 5 positional bronze columns.

    Pad/merge parity (src/pdf/parse_incidents.py:51-56):
    - len < 5 → treat as [datetime, incident_num, ' ', ' ', ori]
      (blank location and nature as a single space, NOT null);
    - len > 5 → location is fields[2..len-3] joined with a space
      (multiline location), nature = fields[len-2], ori = last.
    - len == 5 → positional.
    """
    a = F.col(fields_col)
    n = F.size(a)
    blank = F.lit(" ")

    location = (
        F.when(n < 5, blank)
        .when(n == 5, a[2])
        .otherwise(F.array_join(F.slice(a, F.lit(3), n - 4), " "))
    )
    nature = (
        F.when(n < 5, blank)
        .when(n == 5, a[3])
        .otherwise(F.element_at(a, -2))
    )
    return df.select(
        a[0].alias("datetime_str"),
        a[1].alias("incident_num"),
        location.alias("location"),
        nature.alias("nature"),
        F.element_at(a, -1).alias("incident_ori"),
    )
