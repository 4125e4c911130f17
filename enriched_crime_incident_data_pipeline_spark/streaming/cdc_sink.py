"""Streaming CDC state maintenance: ``foreachBatch`` + associative
changelog fold → a continuously-maintained current-state table.

This is the second gold-maintenance mode next to the append-only
upsert sink (``tests/test_stream_sink.py``): instead of accumulating
immutable facts, the sink maintains ONE row per key under
upsert/delete semantics — the streaming lift of the reference's
in-place UPDATE maintenance (SURVEY.md §2.3 J4-J6).

Per micro-batch: fold the batch (one ``max_by`` aggregation), then
merge with the persisted state by folding state∪batch again — the
fold is associative (see ``operators/cdc.py``), so the persisted
state participates as pre-folded rows whose ``n_changes`` is carried
as the fold weight. Tombstones are retained in storage so
late-arriving older upserts can't resurrect deleted keys; readers use
:func:`read_state` which filters them.

The snapshot is swapped atomically (write to a staging dir, rename
over the old snapshot) — the file-level stand-in for a Delta/Iceberg
``MERGE``; on a lakehouse table the same batch function body becomes
``MERGE INTO state USING folded ON keys WHEN MATCHED …``.

State size is O(|keys|), batch work is O(|batch| + |keys-touched|·
state-merge); the merge join/fold shuffles on the key columns only.
Payload convergence is idempotent by value under replay even without
the checkpoint (re-folding the same changes picks the same winners);
the ``n_changes`` counter is exactly-once only WITH the checkpoint —
both properties are pinned in ``tests/test_stream_sink.py``.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.operators.cdc import (
    fold_changelog,
)

_SNAPSHOT = "state.parquet"


def _snapshot_path(state_dir: str) -> str:
    return os.path.join(state_dir, _SNAPSHOT)


def cdc_state_batch(
    state_dir: str,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    payload_cols: Sequence[str],
    is_delete: Column,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function that maintains the state
    snapshot under ``state_dir``."""
    keys = list(key_cols)
    versions = list(version_cols)
    payload = list(payload_cols)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        folded = fold_changelog(
            batch_df, keys, versions, payload, is_delete
        )
        snap = _snapshot_path(state_dir)
        if os.path.exists(snap):
            existing = spark.read.parquet(snap)
            merged = fold_changelog(
                existing.unionByName(folded),
                keys,
                versions,
                payload,
                F.col("is_deleted"),
                weight_col="n_changes",
            )
        else:
            merged = folded
        staging = os.path.join(state_dir, f"_staging_{uuid.uuid4().hex}")
        merged.write.mode("overwrite").parquet(staging)
        old = os.path.join(state_dir, f"_old_{uuid.uuid4().hex}")
        if os.path.exists(snap):
            os.rename(snap, old)
        os.rename(staging, snap)
        if os.path.exists(old):
            shutil.rmtree(old)

    return fn


def read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current-state view: live keys only (tombstones filtered)."""
    return (
        spark.read.parquet(_snapshot_path(state_dir))
        .filter(~F.col("is_deleted"))
        .drop("is_deleted")
    )
