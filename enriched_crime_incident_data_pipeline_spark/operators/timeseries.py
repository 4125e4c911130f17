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
