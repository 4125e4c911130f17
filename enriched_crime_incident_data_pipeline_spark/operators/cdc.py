"""Change-data-capture merge: changelog → latest-wins table state.

The reference maintains its ``incidents`` table by mutating rows in
place (UPDATE per enrichment stage — SURVEY.md §2.3 J4-J6) and by
``ON CONFLICT DO NOTHING`` keyed inserts (src/db/incidents.py:42).
At 100 TB the same need appears as a *changelog*: a stream of keyed
upserts and delete tombstones whose fold is the current table state.

``latest_state`` computes that fold as ONE map-side-combinable
aggregation — ``max_by(payload, version)`` per key — never a global
sort and never a per-key ``row_number`` window over the full
changelog (an aggregation pre-combines within each input partition,
so the single shuffle moves one row per key per partition, not the
raw history; exactly the shape that survives a 1000-executor
changelog compaction).

Tombstone keys (latest operation is a delete) drop out of the result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_state(
    changelog: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
    is_delete: Column,
) -> DataFrame:
    """Fold a keyed changelog to its current state.

    For each key, pick the payload of the row with the greatest
    ``version_cols`` tuple (total order — make it unique, e.g.
    ``(ts, event_id)``); keys whose winning row satisfies
    ``is_delete`` are omitted. Also returns ``n_changes``, the
    changelog depth per key.
    """
    keys = list(key_cols)
    version = F.struct(*[F.col(c) for c in version_cols])
    winner = F.struct(
        is_delete.alias("_del"), *[F.col(c) for c in payload_cols]
    )
    folded = changelog.groupBy(*keys).agg(
        F.max_by(winner, version).alias("_w"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return folded.filter(~F.col("_w._del")).select(
        *keys,
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
        "n_changes",
    )
