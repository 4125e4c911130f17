"""Streaming event-order audit: dq12's lateness monitor as a live
stream via ``applyInPandasWithState`` (the repo's FIFTH stateful
operator; sessions, sample, gaps and kanon are the others).

The batch twin (registry ``dq12_event_order_audit``) measures, per
user, how far the feed deviates from event-time order along the
event_id append sequence — the number that sizes
``withWatermark`` delays. A live pipeline wants that number
maintained as the feed flows: per-user state carries ``(gen,
max_ts_us, n_events, n_late, max_late_us)`` across micro-batches;
each batch's events sort by event_id, fold against the carried
running-max timestamp (so a late event in batch N+1 relative to
batch N's maximum is counted exactly once, against state), and the
user's CUMULATIVE counters are emitted each batch.
``finalize_order_audit`` keeps each user's last generation and runs
the SAME epilogue code path as batch dq12
(``operators/health.order_audit_report``) — one code path, one
oracle.

Ordering contract: like st7/st28/st30, the carried running max is
only the batch twin's running max when micro-batches arrive in
event_id order per user (file sources deliver oldest-file first and
the spool/file fixtures split by id); the multi-batch equality test
pins a 3-way id-split arrival. Note the pleasing asymmetry: the
AUDIT measures event-TIME disorder and tolerates any amount of it —
only the event-ID arrival order is contracted.

Scale: state is O(|users|) × 5 longs; emissions are one row per
touched user per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "user_id bigint, gen int, n_events bigint, n_late bigint,"
    " max_late_us bigint"
)
_STATE_DDL = (
    "gen int, max_ts long, n_events long, n_late long, max_late_us long"
)


def _update_order(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        gen, max_ts, n_events, n_late, max_late = state.get
    else:
        gen, max_ts, n_events, n_late, max_late = 0, None, 0, 0, 0
    # concatenate before sorting: one logical batch may arrive as
    # several Arrow chunks, and chunk-local sorts would interleave
    parts = [pdf[["event_id", "ts"]] for pdf in batches]
    if parts:
        df = pd.concat(parts).sort_values("event_id")
        for ts in df["ts"]:
            t = ts.value // 1000  # ns -> us, exact integer
            if max_ts is not None and t < max_ts:
                n_late += 1
                if max_ts - t > max_late:
                    max_late = max_ts - t
            if max_ts is None or t > max_ts:
                max_ts = t
            n_events += 1
    gen += 1
    state.update((gen, max_ts, n_events, n_late, max_late))
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="int64"),
            "gen": pd.array([gen], dtype="int32"),
            "n_events": pd.array([n_events], dtype="int64"),
            "n_late": pd.array([n_late], dtype="int64"),
            "max_late_us": pd.array([max_late], dtype="int64"),
        }
    )


def stream_order_counters(stream: DataFrame) -> DataFrame:
    """Per-user cumulative lateness counters as a stateful streaming
    transform: ``(user_id, gen, n_events, n_late, max_late_us)``
    emitted for each user a micro-batch touches; the latest ``gen``
    per user carries its complete audit."""
    return (
        # file-stream sources surface ts as TIMESTAMP_NTZ; the session
        # is pinned UTC so the cast is the identity on the instant
        stream.select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_order,
            outputStructType=_OUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def finalize_order_audit(emitted: DataFrame) -> DataFrame:
    """Collapse the update-mode emission stream to the final dq12
    report: keep each user's latest generation (its cumulative
    counters), then the shared batch epilogue."""
    from enriched_crime_incident_data_pipeline_spark.operators.health import (
        order_audit_report,
    )

    # re-alias both sides: the memory-sink table self-joins and Spark
    # rejects the shared attribute ids otherwise
    left = emitted.select(
        F.col("user_id").alias("_u"),
        F.col("gen").alias("_g"),
        "n_events",
        "n_late",
        "max_late_us",
    )
    latest = emitted.groupBy(F.col("user_id").alias("_lu")).agg(
        F.max("gen").alias("_lg")
    )
    final = left.join(
        latest,
        (F.col("_u") == F.col("_lu")) & (F.col("_g") == F.col("_lg")),
    )
    return order_audit_report(
        final.select("n_events", "n_late", "max_late_us")
    )
