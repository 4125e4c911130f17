"""Key dedup + idempotent append (reference §2 J7/S6).

The reference's ``ON CONFLICT (incident_num) DO NOTHING``
(/root/reference/src/db/incidents.py:37-45) becomes:
within-batch ``dropDuplicates`` + left-anti join against existing
keys, then append. At 100 TB the anti-join shuffles only the key
column (project before join) and AQE picks broadcast when the
existing-keys side is small per-partition-pruned date range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_by_key(df: DataFrame, keys: list[str] | str) -> DataFrame:
    """Keep one arbitrary row per key (reference keeps the first
    inserted; any single row satisfies the contract — downstream
    derivations are functions of the key row's own fields)."""
    if isinstance(keys, str):
        keys = [keys]
    return df.dropDuplicates(keys)


def idempotent_append(batch: DataFrame, existing: DataFrame, keys: list[str] | str) -> DataFrame:
    """Rows of ``batch`` whose key is absent from ``existing`` —
    the insert set of an ``ON CONFLICT DO NOTHING`` append.

    Returns the to-insert rows; callers union/write them. Keys-only
    projection on the right side keeps the shuffle narrow.
    """
    if isinstance(keys, str):
        keys = [keys]
    return dedup_by_key(batch, keys).join(
        existing.select(*keys), on=keys, how="left_anti"
    )
