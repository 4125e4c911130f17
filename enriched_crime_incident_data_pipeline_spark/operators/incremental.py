"""Incremental aggregation state — maintain a grouped aggregate
without rescanning history.

The reference recomputes its frequency ranks over the whole table on
every run (`/root/reference/src/db/incidents.py:64-74` — fine at
daily-PDF scale, quadratic over time at 100 TB). The warehouse-native
fix is algebraic aggregation state: keep per-key partials
(count + exact decimal sum), fold each new batch into them with a
keys-sized merge, and derive the presentation aggregates (count /
sum / avg) from the state. Only the delta is ever scanned; the merge
shuffles |keys| + |delta keys| rows, independent of history size.

Works for any algebraic aggregate (count/sum/min/max and
compositions like avg); holistic aggregates (exact median) need the
raw data or a mergeable sketch (see ``datapipe/sketch.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: Sequence[str] | str, value_col: str) -> DataFrame:
    """Per-key algebraic state for count/sum/avg/min/max of
    ``value_col``: ``(keys…, cnt, total, vmin, vmax)``. ``total`` is
    an exact DECIMAL(18,2) sum so merges are order-insensitive."""
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def merge_agg_states(
    states: Sequence[DataFrame], keys: Sequence[str] | str
) -> DataFrame:
    """Fold any number of states into one — union + keys-sized
    re-combine. ``merge(state(A), state(B)) == state(A ∪ B)`` exactly
    (count/sum add; min/max take extrema)."""
    if isinstance(keys, str):
        keys = [keys]
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def finalize_agg(state: DataFrame) -> DataFrame:
    """Presentation aggregates from state: count, exact sum (as
    double), avg (exact sum / count), min, max."""
    return state.select(
        *[c for c in state.columns if c not in ("cnt", "total", "vmin", "vmax")],
        F.col("cnt").alias("n"),
        F.col("total").cast("double").alias("sum_value"),
        (F.col("total").cast("double") / F.col("cnt")).alias("avg_value"),
        F.col("vmin").alias("min_value"),
        F.col("vmax").alias("max_value"),
    )
