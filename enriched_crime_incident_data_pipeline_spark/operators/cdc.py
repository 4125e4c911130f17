"""Change-data-capture merge: changelog → latest-wins table state.

The reference maintains its ``incidents`` table by mutating rows in
place (UPDATE per enrichment stage — SURVEY.md §2.3 J4-J6) and by
``ON CONFLICT DO NOTHING`` keyed inserts (src/db/incidents.py:42).
At 100 TB the same need appears as a *changelog*: a stream of keyed
upserts and delete tombstones whose fold is the current table state.

``fold_changelog`` computes that fold as ONE map-side-combinable
aggregation — ``max_by(payload, version)`` per key — never a global
sort and never a per-key ``row_number`` window over the full
changelog (an aggregation pre-combines within each input partition,
so the single shuffle moves one row per key per partition, not the
raw history; exactly the shape that survives a 1000-executor
changelog compaction).

The fold is **associative**: folding a fold with more changes gives
the same winner as folding everything at once (max_by composes, and
``n_changes`` sums when pre-folded rows carry their count as the
``weight_col``). That property is what lets a streaming sink maintain
the state incrementally (``streaming/cdc_sink.py``) — each
micro-batch folds locally, then merges with the persisted state as
two pre-folded rows per key. Tombstones must be RETAINED in the
persisted state (``keep_tombstones``) so a late-arriving older upsert
cannot resurrect a deleted key; only the final read view drops them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fold_changelog(
    changelog: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
    is_delete: Column,
    weight_col: str | None = None,
) -> DataFrame:
    """Fold a keyed changelog: one row per key carrying the winning
    version's payload, version, and ``is_deleted`` flag, plus
    ``n_changes`` (Σ of ``weight_col``, default 1 per row).

    ``version_cols`` must totally order a key's changes (make the
    tuple unique, e.g. ``(ts, event_id)``).
    """
    keys = list(key_cols)
    version = F.struct(*[F.col(c) for c in version_cols])
    winner = F.struct(
        is_delete.alias("_del"),
        *[F.col(c) for c in version_cols],
        *[F.col(c) for c in payload_cols],
    )
    weight = (
        F.col(weight_col) if weight_col is not None else F.lit(1)
    )
    folded = changelog.groupBy(*keys).agg(
        F.max_by(winner, version).alias("_w"),
        F.sum(weight).cast("long").alias("n_changes"),
    )
    return folded.select(
        *keys,
        *[F.col(f"_w.{c}").alias(c) for c in version_cols],
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
        F.col("_w._del").alias("is_deleted"),
        "n_changes",
    )


def latest_state(
    changelog: DataFrame,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
    is_delete: Column,
) -> DataFrame:
    """Current-state view of a changelog: latest payload per key,
    tombstoned keys omitted, plus ``n_changes`` changelog depth."""
    full = fold_changelog(
        changelog, key_cols, version_cols, payload_cols, is_delete
    )
    return full.filter(~F.col("is_deleted")).select(
        *key_cols, *payload_cols, "n_changes"
    )
