"""Watermarked windowed aggregation + a bounded-run helper.

``tumbling_counts`` is the streaming twin of the batch
``window_tumbling`` query — same 5-minute tumbling window, same
aggregates — so a bounded run over the same files must produce the
identical result (that equivalence is oracle-checked by the driver).

Watermark semantics: ``withWatermark`` bounds state — windows older
than (max event time − delay) are finalized and their state dropped.
On an unbounded feed this is what keeps a 1000-executor job's state
store flat; on a bounded backfill (``Trigger.AvailableNow``) we run
the aggregation in ``complete`` mode so every window is emitted
regardless of where the final watermark lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """(window_start, event_type, n, total_value) per tumbling window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_available_now(
    sdf: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion over all currently
    available input (``Trigger.AvailableNow``) into an in-memory
    table and return it as a batch DataFrame.

    This is the test/backfill harness; production sinks swap
    ``format("memory")`` for parquet/Delta + checkpointLocation with
    the same trigger.
    """
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
