"""Deterministic moment statistics (mean / variance / z-score /
correlation) for cross-engine-exact analytics.

Floating-point sums are order-dependent, so naive ``avg``/``stddev``/
``corr`` differ between engines (and between runs, as partitioning
shifts). The fix used throughout this engine: accumulate moments as
exact DECIMAL sums (addition is associative), then derive the
statistic with a fixed sequence of double operations — every engine
computes the same doubles from the same exact sums. Squares of
DECIMAL(18,2) values are DECIMAL scale-4, still exact.

This is also the scalable shape: one partial+final aggregation per
group (map-side combine), no second pass over the data for variance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(c: Column) -> Column:
    return c.cast("decimal(18,2)")


def moments(value: Column) -> dict[str, Column]:
    """Aggregate columns for exact first/second moments of ``value``
    (rounded to 2 decimals on entry, identically in any engine)."""
    v = dec2(value)
    return {
        "n": F.count(F.lit(1)),
        "s": F.sum(v),
        "ss": F.sum(v * v),
    }


def mean_from_moments(n: Column, s: Column) -> Column:
    return s.cast("double") / n


def var_from_moments(n: Column, s: Column, ss: Column) -> Column:
    """Population variance via E[X²] − E[X]²; clamped at 0 (the
    subtraction can land epsilon-negative)."""
    m = mean_from_moments(n, s)
    return F.greatest(ss.cast("double") / n - m * m, F.lit(0.0))
