"""Slowly-changing-dimension (SCD type 2) interval build.

The reference mutates its dimension rows in place (SURVEY.md §1.2);
the warehouse-native alternative is SCD2: each change event opens a
validity interval ``[valid_from, valid_to)`` and the previous one
closes. Built from an event log with one ``lead()`` window per key —
a single hash shuffle on the key, windows parallel across keys, no
global ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Every event row becomes a dimension version: ``valid_from`` is
    its timestamp, ``valid_to`` the next version's timestamp for the
    same key (NULL for the current version — flagged ``is_current``).

    ``tiebreak_col`` totalizes the order within equal timestamps so
    the intervals are deterministic.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    return (
        events.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )
