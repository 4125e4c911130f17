"""Frequency ranks (reference §2 A1/A2 + W1/W2 + J4).

The reference runs
``RANK() OVER (ORDER BY COUNT(*) DESC)`` on ``GROUP BY location`` /
``GROUP BY nature`` CTEs and UPDATE-joins the rank back
(/root/reference/src/db/incidents.py:64-74). RANK semantics: ties
share a rank and leave gaps (not dense_rank / row_number).

Scale design: a global ``Window.orderBy`` would collapse to a single
partition. Instead we aggregate first — the grouped output is tiny
(distinct locations/natures, not rows) — rank over *that*, and
broadcast-join the rank table back to the fact. The only wide shuffle
is the groupBy, which does map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequency_rank_table(df: DataFrame, key: str, rank_col: str) -> DataFrame:
    """``key, <rank_col>`` table: RANK() by descending frequency of
    ``key`` in ``df``. The window runs over the aggregated (small)
    table; deterministic because rank depends only on the count."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_freq"))
    w = Window.orderBy(F.desc("_freq"))
    return counts.select(
        F.col(key), F.rank().over(w).cast("int").alias(rank_col)
    )


def with_frequency_rank(df: DataFrame, key: str, rank_col: str) -> DataFrame:
    """Attach the frequency rank of ``key`` to every row (J4
    join-back). The rank table is orders-of-magnitude smaller than the
    fact table — broadcast it so the fact side never shuffles."""
    ranks = frequency_rank_table(df, key, rank_col)
    return df.join(F.broadcast(ranks), on=key, how="left")
