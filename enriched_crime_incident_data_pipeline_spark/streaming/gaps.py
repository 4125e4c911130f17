"""Custom stateful streaming operator: per-user inter-event gap
tracking via ``applyInPandasWithState`` (the repo's third use;
sessions.py and sample.py are the others).

The batch twin (registry ``ts10_gap_histogram``) computes the log2
gap-bucket histogram with a per-user lag window.  A live pipeline
wants the same histogram maintained continuously — it is the input to
re-tuning the sessionization threshold — and a lag window cannot run
on a stream.  The streaming formulation keeps per-user state
``(last_ts, gen, counts[44])`` across micro-batches: each batch's
events sort by (ts, event_id), gaps fold against the carried
``last_ts`` (so batch boundaries create NO seams — the gap that
spans two micro-batches is counted exactly once, against the state's
timestamp), bucket counts accumulate in the fixed 44-cell array
(bucket = gap.bit_length() covers gaps to 2⁴³ s ≈ 278 k years), and
each batch emits the user's CUMULATIVE nonzero buckets tagged with a
``gen`` counter.  ``finalize_gap_histogram`` keeps each user's last
generation, sums buckets across users, and runs the SAME epilogue
code path as batch ts10 (``operators/timeseries.gap_histogram_report``)
— one oracle serves both.

Scale: state is O(|users|) × 44 longs; the shuffle partitions the
user key space (state store sizing per run_available_now's
docstring).  Emissions are ≤ nonzero-buckets rows per user per batch
— bounded by 44, not by events.

Ordering contract: like st7/st21/st28, correctness of the carried
``last_ts`` needs micro-batches that arrive in event-time order per
user (file-stream sources deliver oldest-file first); the multi-batch
equality test pins a 3-way time-split arrival.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_N_BUCKETS = 44

_OUT_DDL = "user_id bigint, gen int, bucket int, n_gaps bigint"
_STATE_DDL = "last_ts double, gen int, counts array<bigint>"


def _update_gaps(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, gen, counts = state.get
        counts = list(counts)
    else:
        last_ts, gen, counts = None, 0, [0] * _N_BUCKETS
    # concatenate before sorting: one logical batch may arrive as
    # several Arrow chunks, and chunk-local sorts would interleave
    parts = [pdf["ts"] for pdf in batches]
    ts_sorted = (
        pd.concat(parts).sort_values() if parts else pd.Series([], dtype="object")
    )
    for ts in ts_sorted:
        epoch = int(ts.timestamp())
        if last_ts is not None:
            gap = epoch - int(last_ts)
            bucket = 0 if gap <= 0 else gap.bit_length()
            counts[bucket] += 1
        last_ts = epoch
    gen += 1
    state.update((float(last_ts) if last_ts is not None else None, gen, counts))
    buckets = [b for b in range(_N_BUCKETS) if counts[b] > 0]
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]] * len(buckets), dtype="int64"),
            "gen": pd.array([gen] * len(buckets), dtype="int32"),
            "bucket": pd.array(buckets, dtype="int32"),
            "n_gaps": pd.array([counts[b] for b in buckets], dtype="int64"),
        }
    )


def stream_gap_buckets(stream: DataFrame) -> DataFrame:
    """Per-user cumulative gap-bucket counts as a stateful streaming
    transform: ``(user_id, gen, bucket, n_gaps)`` emitted each
    micro-batch in update mode; the latest ``gen`` per user carries
    that user's complete histogram."""
    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_gaps,
            outputStructType=_OUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def finalize_gap_histogram(emitted: DataFrame) -> DataFrame:
    """Collapse the update-mode emission stream to the final global
    report: keep each user's latest generation (its cumulative
    histogram), sum buckets across users, then the batch epilogue."""
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        gap_histogram_report,
    )

    # re-alias both sides: the memory-sink table self-joins and Spark
    # rejects the shared attribute ids otherwise
    left = emitted.select(
        F.col("user_id").alias("_u"),
        F.col("gen").alias("_g"),
        "bucket",
        "n_gaps",
    )
    latest = emitted.groupBy(F.col("user_id").alias("_lu")).agg(
        F.max("gen").alias("_lg")
    )
    final_rows = left.join(
        latest,
        (F.col("_u") == F.col("_lu")) & (F.col("_g") == F.col("_lg")),
    )
    hist = final_rows.groupBy("bucket").agg(
        F.sum("n_gaps").cast("bigint").alias("n_gaps")
    )
    return gap_histogram_report(hist)
