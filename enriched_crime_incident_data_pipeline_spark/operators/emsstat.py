"""EMSSTAT propagation (reference §2 J2/W3).

The reference propagates ``emsstat=1`` to all rows sharing
(incident_ts, location) via a self-join UPDATE
(/root/reference/src/db/incidents.py:48-55). The fixpoint of that
update is exactly a window max:
``emsstat' = max(emsstat) OVER (PARTITION BY incident_ts, location)``.

``propagate_emsstat`` is the production formulation (one shuffle on
the composite key, no self-join blow-up on hot keys).
``propagate_emsstat_selfjoin`` is the literal translation kept as a
semantic witness — tests pin that both produce identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def propagate_emsstat(
    df: DataFrame,
    ts_col: str = "incident_ts",
    loc_col: str = "location",
    flag_col: str = "emsstat",
) -> DataFrame:
    """Window-max formulation — the scalable path."""
    w = Window.partitionBy(ts_col, loc_col)
    return df.withColumn(flag_col, F.max(flag_col).over(w))


def propagate_emsstat_selfjoin(
    df: DataFrame,
    key_col: str = "incident_num",
    ts_col: str = "incident_ts",
    loc_col: str = "location",
    flag_col: str = "emsstat",
) -> DataFrame:
    """Literal port of the reference self-join
    (i1.ts = i2.ts AND i1.loc = i2.loc AND i1.key <> i2.key AND
    i1.flag = 1 AND i2.flag = 0 → set i2.flag = 1). Semantic witness
    only; prefer ``propagate_emsstat``."""
    flagged = (
        df.filter(F.col(flag_col) == 1)
        .select(
            F.col(ts_col).alias("_ts"),
            F.col(loc_col).alias("_loc"),
            F.col(key_col).alias("_key"),
        )
    )
    to_set = (
        df.filter(F.col(flag_col) == 0)
        .join(
            flagged,
            (F.col(ts_col) == F.col("_ts"))
            & (F.col(loc_col) == F.col("_loc"))
            & (F.col(key_col) != F.col("_key")),
            "left_semi",
        )
        .select(F.col(key_col))
    )
    return df.join(
        to_set.withColumn("_hit", F.lit(1)), on=key_col, how="left"
    ).withColumn(
        flag_col,
        F.when(F.col("_hit") == 1, F.lit(1)).otherwise(F.col(flag_col)),
    ).drop("_hit")


def dedup_and_propagate(
    df: DataFrame,
    key_col: str = "incident_num",
    ts_col: str = "incident_ts",
    loc_col: str = "location",
    flag_col: str = "emsstat",
) -> DataFrame:
    """Key-dedup + EMSSTAT propagation fused onto ONE shuffle.

    ``dropDuplicates(key)`` then ``max() OVER (ts, loc)`` costs two
    full-table shuffles back-to-back. But duplicate incident rows are
    re-ingestions of the same record, so they agree on (ts, loc) —
    which means a single hash shuffle on (ts, loc) colocates both the
    dedup groups and the propagation groups: run the dedup as a
    row_number window keyed (ts, loc, key) (satisfied by the (ts,
    loc) partitioning — no second exchange) and the propagation as
    the usual (ts, loc) window max.

    Precondition: rows sharing ``key_col`` must share (ts, loc).
    Where that cannot be assumed, use ``dedup_by_key`` +
    ``propagate_emsstat`` (two shuffles, no precondition).
    """
    part = df.repartition(F.col(ts_col), F.col(loc_col))
    w_dedup = Window.partitionBy(ts_col, loc_col, key_col).orderBy(key_col)
    deduped = (
        part.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_prop = Window.partitionBy(ts_col, loc_col)
    return deduped.withColumn(flag_col, F.max(flag_col).over(w_prop))
