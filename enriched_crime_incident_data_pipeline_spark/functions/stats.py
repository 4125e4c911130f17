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


def trend_from_moments(
    agg: "DataFrame", group_cols: "list[str] | None" = None
) -> "DataFrame":
    """OLS epilogue shared by batch stat6 and streaming st25: given
    per-group exact decimal co-moment sums ``(n, sx, sy, sxx, syy,
    sxy)``, publish the sign-safe integer slope (milli-units/day)
    and the two-step-floored r² in bp (see stat6's overflow note).

    ``group_cols``: the group-key columns to carry through.  When
    None (the default) they are INFERRED as every column of ``agg``
    not named ``n/sx/sy/sxx/syy/sxy`` — a caller whose real group
    column collides with one of THOSE moment names must pass
    ``group_cols`` explicitly or the column is consumed as a moment.
    The internal num/den/vary intermediates use collision-proof
    ``_tfm_``-prefixed names (r8: a group column literally named
    'num' used to be OVERWRITTEN by the withColumn even under
    explicit group_cols; pinned by
    ``test_trend_from_moments_explicit_group_cols_survives_reserved_name``).

    The co-moments num = n·Σxy − ΣxΣy, den = n·Σx² − (Σx)² and
    vary are EXACTLY shift-invariant in integer arithmetic (shifting
    x by any constant c cancels: n(Σxy+cΣy) − (Σx+nc)Σy = num), so a
    batch caller that re-bases x for magnitude control and a
    streaming caller that cannot (a global min is itself a stream
    aggregation) produce bit-identical outputs — which is what lets
    ONE oracle serve both."""
    agg = (
        agg.withColumn("_tfm_num", F.expr("n * sxy - sx * sy"))
        .withColumn("_tfm_den", F.expr("n * sxx - sx * sx"))
        .withColumn("_tfm_vary", F.expr("n * syy - sy * sy"))
    )
    if group_cols is None:
        group_cols = [
            c for c in agg.columns
            if c not in {"n", "sx", "sy", "sxx", "syy", "sxy",
                         "_tfm_num", "_tfm_den", "_tfm_vary"}
        ]
    return agg.select(
        *group_cols,
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST(CASE WHEN _tfm_den = 0 THEN 0"
            " WHEN _tfm_num < 0 THEN -(((-_tfm_num) * 86400) DIV _tfm_den)"
            " ELSE (_tfm_num * 86400) DIV _tfm_den END AS BIGINT)"
        ).alias("slope_milli_per_day"),
        F.expr(
            "CAST(CASE WHEN _tfm_den = 0 OR _tfm_vary = 0 THEN 0"
            " ELSE ((abs(_tfm_num) * 10000 DIV _tfm_vary) * abs(_tfm_num))"
            " DIV _tfm_den END AS BIGINT)"
        ).alias("r2_bp"),
    )
