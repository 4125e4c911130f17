"""Streaming k-anonymity monitor: dq11's quasi-identifier audit as a
live privacy gate via ``applyInPandasWithState`` (the repo's FOURTH
stateful operator; sessions.py, sample.py and gaps.py are the
others).

The batch twin (registry ``dq11_k_anonymity``) summarizes how
identifying a quasi-identifier combination is over a static table. A
release pipeline wants the same audit maintained continuously —
every arriving batch of rows changes group sizes, and the question
"is any group still below the k bar?" must be answerable between
batches, not at the next nightly run. The streaming formulation
keys state by the quasi-identifier tuple and carries ``(gen, sz)``
across micro-batches: each batch adds its row count to the group's
cumulative size and emits one row per TOUCHED group —
``(quasi-id…, gen, sz, under_k)`` — so downstream sees both the
running size and an ALERT flag while the group sits below ``k``
(a group that has crossed the bar stops alerting; integer counts
merge in any batch order, so arrival order never matters — unlike
st7/st28 there is no ordering contract at all).

``finalize_k_anonymity`` keeps each group's latest generation (its
cumulative size) and runs the SAME epilogue code path as batch dq11
(``operators/health.k_anonymity_report``) — one code path, one
oracle, the st30/ts10 discipline.

Scale: state is O(|quasi-id domain|) × 2 longs — the audit's own
output bound, never the row stream. Emissions are ≤ touched groups
per batch. The quasi-id key partitions the state store; size
``state_partitions`` to the group domain per run_available_now's
docstring.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "c_nationkey int, c_mktsegment string, gen int, sz bigint, under_k int"
)
_STATE_DDL = "gen int, sz long"


def _make_update(k: int):
    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            gen, sz = state.get
        else:
            gen, sz = 0, 0
        n = 0
        for pdf in batches:
            n += len(pdf)
        sz += n
        gen += 1
        state.update((gen, sz))
        yield pd.DataFrame(
            {
                "c_nationkey": pd.array([key[0]], dtype="int32"),
                "c_mktsegment": pd.array([key[1]], dtype="object"),
                "gen": pd.array([gen], dtype="int32"),
                "sz": pd.array([sz], dtype="int64"),
                "under_k": pd.array([1 if sz < k else 0], dtype="int32"),
            }
        )

    return update


def stream_group_sizes(stream: DataFrame, k: int = 5) -> DataFrame:
    """Per-quasi-identifier cumulative group sizes as a stateful
    streaming transform: ``(c_nationkey, c_mktsegment, gen, sz,
    under_k)`` emitted for each group a micro-batch touches; the
    latest ``gen`` per group carries its complete running size, and
    ``under_k`` is the live below-bar alert."""
    return (
        stream.select("c_nationkey", "c_mktsegment")
        .groupBy("c_nationkey", "c_mktsegment")
        .applyInPandasWithState(
            _make_update(k),
            outputStructType=_OUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def finalize_k_anonymity(emitted: DataFrame, k: int = 5) -> DataFrame:
    """Collapse the update-mode emission stream to the final dq11
    report: keep each group's latest generation (its cumulative
    size), then the shared batch epilogue."""
    from enriched_crime_incident_data_pipeline_spark.operators.health import (
        k_anonymity_report,
    )

    # re-alias both sides: the memory-sink table self-joins and Spark
    # rejects the shared attribute ids otherwise
    left = emitted.select(
        F.col("c_nationkey").alias("_n"),
        F.col("c_mktsegment").alias("_m"),
        F.col("gen").alias("_g"),
        "sz",
    )
    latest = emitted.groupBy(
        F.col("c_nationkey").alias("_ln"), F.col("c_mktsegment").alias("_lm")
    ).agg(F.max("gen").alias("_lg"))
    final = left.join(
        latest,
        (F.col("_n") == F.col("_ln"))
        & (F.col("_m") == F.col("_lm"))
        & (F.col("_g") == F.col("_lg")),
    )
    return k_anonymity_report(final.select("sz"), k=k)
