"""Frequency ranks (reference §2 A1/A2 + W1/W2 + J4).

The reference runs
``RANK() OVER (ORDER BY COUNT(*) DESC)`` on ``GROUP BY location`` /
``GROUP BY nature`` CTEs and UPDATE-joins the rank back
(/root/reference/src/db/incidents.py:64-74). RANK semantics: ties
share a rank and leave gaps (not dense_rank / row_number).

Scale design: a global ``Window.orderBy`` collapses to a single
partition, and even windowing over the grouped key table is a global
sort of the whole key domain (billions of keys for a high-cardinality
dimension). RANK by descending count depends only on the count
*value*: ``rank(c) = 1 + Σ_{c' > c} |keys with count c'|``. So we
aggregate twice — keys→counts (wide, map-side combined), then
counts→(count value, n_keys) (tiny: distinct frequency values, which
are heavy-tailed integers) — run the one unavoidable ordered window
over that value histogram, and broadcast the value→rank map back.
No stage ever sorts more than |distinct count values| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequency_rank_table(df: DataFrame, key: str, rank_col: str) -> DataFrame:
    """``key, <rank_col>`` table: RANK() by descending frequency of
    ``key`` in ``df``. Exact SQL RANK tie semantics (ties share a
    rank, gaps follow), computed from the count-value histogram so no
    global sort of the key domain occurs."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_freq"))
    hist = counts.groupBy("_freq").agg(F.count(F.lit(1)).alias("_n_keys"))
    w = Window.orderBy(F.desc("_freq"))  # |distinct count values| rows
    val_rank = hist.select(
        "_freq",
        (F.lit(1) + F.sum("_n_keys").over(w) - F.col("_n_keys"))
        .cast("int")
        .alias(rank_col),
    )
    return counts.join(F.broadcast(val_rank), "_freq").select(
        F.col(key), F.col(rank_col)
    )


def with_frequency_rank(df: DataFrame, key: str, rank_col: str) -> DataFrame:
    """Attach the frequency rank of ``key`` to every row (J4
    join-back). The rank table is orders-of-magnitude smaller than the
    fact table — broadcast it so the fact side never shuffles."""
    ranks = frequency_rank_table(df, key, rank_col)
    return df.join(F.broadcast(ranks), on=key, how="left")
