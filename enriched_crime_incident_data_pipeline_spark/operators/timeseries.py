"""Time-series regularization: gap-filling and forward-fill.

Event tables are sparse (a user has rows only on active days);
models and reports need dense regular series. Two standard ops:

- :func:`gapfill_daily` — densify to one row per (key, day) over a
  fixed span, zero-filling missing measures. The day grid is a
  ``sequence``+``explode`` per key (narrow — no shuffle beyond the
  final left join, which hash-partitions on the key).
- :func:`forward_fill` — carry the last observed value forward, per
  key, via ``last(ignorenulls)`` over an unbounded-preceding frame —
  one window per key, parallel across keys.

Both are engine-exact (no floats invented, NULL semantics explicit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_daily(
    observed: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    span_start: str,
    span_end: str,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """One row per (key, day) for every day in
    ``[span_start, span_end]``: observed rows pass through, missing
    days get ``fill`` values (column → literal; default 0).

    The key universe is the distinct keys of ``observed``.
    """
    keys = list(key_cols)
    grid = (
        observed.select(*keys)
        .distinct()
        .withColumn(
            day_col,
            F.explode(
                F.sequence(
                    F.to_date(F.lit(span_start)),
                    F.to_date(F.lit(span_end)),
                )
            ),
        )
    )
    out = grid.join(observed, [*keys, day_col], "left")
    for col, default in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return out


def coalesce_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_us_col: str,
    end_us_col: str,
) -> DataFrame:
    """Merge overlapping/touching ``[start, end)`` intervals per key
    (gaps-and-islands) and report per-key island count and total
    covered span.

    Times are integer microseconds (``unix_micros``) so the span
    arithmetic is exact in any engine. An interval starts a new
    island iff its start exceeds the running max end of every earlier
    interval of the key; island id is the running count of such
    starts. Both windows and the island aggregation share one hash
    partitioning by key — a single shuffle end-to-end, parallel
    across keys at any scale.

    Returns one row per key: ``n_islands``,
    ``covered_us = Σ_islands (max end − min start)``.
    """
    keys = list(key_cols)
    order = Window.partitionBy(*keys).orderBy(start_us_col, end_us_col)
    prev_max_end = F.max(F.col(end_us_col)).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull()
            | (F.col(start_us_col) > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy(*keys, "_island").agg(
        F.min(start_us_col).alias("_s"), F.max(end_us_col).alias("_e")
    )
    return islands.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("_e") - F.col("_s")).alias("covered_us"),
    )


def cumulative_distinct_daily(
    df: DataFrame, id_col: str, ts_col: str
) -> DataFrame:
    """Running distinct-entity count per day: each entity counts on
    its first-seen day, then forever after.

    Distinct-per-prefix is re-founded as first-seen aggregation —
    ``min(day) per entity`` (one map-side-combinable shuffle by
    entity) → daily new-entity counts (shuffle by day) → a running
    sum over the *day* relation only. The ordered window touches one
    row per day, never the fact table, so there is no global
    single-partition pass over data that grows with volume.

    Returns ``(day, new_entities, cumulative_entities)``.
    """
    first_seen = df.groupBy(id_col).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_entities")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn(
        "cumulative_entities", F.sum("new_entities").over(w)
    )


def forward_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-NULL ``value_col`` forward within each key,
    in ``order_col`` order (leading NULLs stay NULL)."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or value_col, F.last(value_col, ignorenulls=True).over(w)
    )


def max_concurrency(
    intervals: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open half-open intervals
    ``[start, end)`` per key, and the earliest instant that peak is
    reached — the sweep-line statistic behind capacity planning
    (max concurrent sessions / connections / jobs).

    Sweep-line as relational algebra: each interval contributes a
    ``+1`` delta at ``start`` and a ``-1`` at ``end``; the running
    sum of deltas in ``(t, d)`` order IS the concurrency curve, and
    ordering ``d = -1`` before ``d = +1`` at equal ``t`` encodes the
    half-open convention (an interval ending exactly when another
    starts never overlaps it). All arithmetic is integer, so the
    result is exact under any partitioning; within a block of tied
    ``(t, d)`` rows the prefix sums form the same *multiset* in any
    engine-chosen order (descending for ``-1`` blocks, ascending for
    ``+1`` blocks), and the peak is always the last row of a ``+1``
    block — so ``max`` and its earliest ``t`` are deterministic even
    though per-row sums at ties are not.

    Scale shape: ONE hash shuffle by key (the union is narrow; the
    window partitions by key; the final group-by reuses the window's
    partitioning, so AQE inserts no second exchange). Per-task memory
    is O(1) — a running sum, never a buffered partition. The peak is
    extracted with a single ``max(struct(run, -t))`` — no second
    window pass and no join-back.

    Returns one row per key: ``(*keys, max_concurrency, peak_at)``
    where ``peak_at`` is the earliest ``start_col`` value at which
    the peak is attained (same unit as the inputs).
    """
    keys = list(key_cols)
    starts = intervals.select(
        *keys, F.col(start_col).alias("t"), F.lit(1).alias("d")
    )
    ends = intervals.select(
        *keys, F.col(end_col).alias("t"), F.lit(-1).alias("d")
    )
    return peak_from_deltas(starts.unionByName(ends), keys, "t", "d")


def peak_from_deltas(
    deltas: DataFrame,
    key_cols: Sequence[str],
    t_col: str = "t",
    d_col: str = "d",
) -> DataFrame:
    """Sweep epilogue shared by the batch and streaming forms: max
    running sum of ``d_col`` in ``(t, d)`` order per key, plus the
    earliest ``t`` attaining it.

    Works identically on raw ±1 delta rows and on per-(key, t) *net*
    deltas (the streaming-state form): within an instant the raw
    sequence first descends through the ``-1`` block then ascends
    through the ``+1`` block, so every within-instant value is
    bounded by the net values of the adjacent instants — the global
    max over raw rows equals the max over net-per-instant values,
    and so does its earliest instant. That is what makes the
    net-delta histogram a sufficient streaming state.
    """
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_col, d_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.withColumn("c", F.sum(d_col).over(w))
    peak = run.groupBy(*keys).agg(
        F.max(
            F.struct(F.col("c").alias("c"), (-F.col(t_col)).alias("nt"))
        ).alias("m")
    )
    return peak.select(
        *keys,
        F.col("m.c").cast("int").alias("max_concurrency"),
        (-F.col("m.nt")).cast("long").alias("peak_at"),
    )


def gap_histogram_report(hist: DataFrame) -> DataFrame:
    """Epilogue shared by batch ts10 and streaming st30: given the
    log2-bucket gap histogram ``(bucket, n_gaps)`` — exactly the
    relation a stateful stream maintains — publish the report with
    bucket lower bounds, integer-bp shares, and cumulative shares.
    Every window here runs over the ≤40-row histogram (w1's trick),
    never an event stream."""
    from pyspark.sql import functions as F

    tot = hist.agg(F.sum("n_gaps").alias("_tot"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            "CAST(CASE WHEN bucket = 0 THEN 0 ELSE"
            " shiftleft(CAST(1 AS BIGINT), bucket - 1) END AS BIGINT)"
        ).alias("lo_sec"),
        "n_gaps",
        F.expr("CAST((n_gaps * 10000) DIV _tot AS BIGINT)").alias("share_bp"),
        F.expr(
            "CAST((SUM(n_gaps) OVER (ORDER BY bucket ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) DIV _tot"
            " AS BIGINT)"
        ).alias("cum_bp"),
    )
