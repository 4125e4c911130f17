"""As-of (point-in-time) join — an operator the reference's SQL
surface never needed (it has equi-joins only, SURVEY.md §2.3) but any
event/feature pipeline does: for each left row, attach the most
recent right row with ``right.ts <= left.ts`` for the same key.

Spark has no native ASOF JOIN, and the naive formulations are wrong
at scale: a theta-join (``r.ts <= l.ts``) explodes quadratically per
key, and a per-row subquery doesn't exist. The implementation here is
the union-tag pattern:

1. tag left rows ``_side=1`` and right rows ``_side=0`` and union
   them on the shared ``(keys, ts)`` spine;
2. one window per key, ordered ``(ts, _side, tiebreak)`` — right
   rows sort *before* left rows at equal ts, so "at-or-before" is
   exactly "earlier in the order";
3. ``last(right_payload, ignorenulls=True)`` over rows up to the
   current row carries the latest right payload forward;
4. keep only left rows.

Cost: ONE shuffle (hash on the key columns) and one sort within
partitions — the same price as a regular join, with no per-key
blowup. The window parallelizes across keys, so there is no global
ordering and no single-partition collapse at 100 TB. Ties at equal
``ts`` resolve to the greatest ``tiebreak`` (deterministic, total).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    asof_prefix: str = "asof_",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``asof_<col>`` columns
    from the matched right row (NULLs when none exists), where the
    match is per ``direction`` (the pandas ``merge_asof`` surface):

    - ``backward`` (default): most recent right with
      ``right.ts <= left.ts`` — exact-ts ties to the GREATEST
      tiebreak;
    - ``forward``: earliest right with ``right.ts >= left.ts`` —
      ties to the LEAST tiebreak;
    - ``nearest``: whichever of the two is closer in ``ts``;
      equidistant resolves BACKWARD (pandas semantics). One shuffle
      still — the union carries the right rows twice (once per scan
      direction), and both windows share the key partitioning, so
      the cost is two in-partition sorts, never a second exchange.

    ``tolerance`` (optional): a Column expression (e.g.
    ``F.expr("INTERVAL 30 MINUTES")`` for timestamps, a numeric
    literal for numeric ts) — matches farther than ``tolerance``
    from the left row null out AFTER the match resolves, exactly
    pandas' semantics (the match is not "re-routed" to a closer
    in-tolerance row that lost the as-of rule; for backward/forward
    no such row can exist, and for nearest the loser is farther by
    definition). Applied as a residual null-out predicate, so the
    plan shape is unchanged.

    ``tiebreak_col`` must exist in both inputs and make
    ``(ts, tiebreak)`` unique per key on the right side — it pins
    which right row wins an exact-ts tie, keeping results engine- and
    partitioning-independent.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    keys = list(key_cols)
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )

    def right_tagged(side: int, payload: str) -> DataFrame:
        return right.select(
            *[F.col(k) for k in keys],
            F.col(ts_col).alias("_ts"),
            F.col(tiebreak_col).alias("_tb"),
            F.lit(side).alias("_side"),
            F.struct(*[F.col(c) for c in right.columns]).alias(payload),
        )

    # side ordering makes the inclusive bound exact at equal ts:
    # backward rights (side 0) sort BEFORE left rows (side 1), so the
    # trailing frame sees them; forward rights (side 2) sort AFTER,
    # so the leading frame sees them.
    parts = []
    if direction in ("backward", "nearest"):
        parts.append(right_tagged(0, "_r0"))
    parts.append(l2)
    if direction in ("forward", "nearest"):
        parts.append(right_tagged(2, "_r2"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p, allowMissingColumns=True)

    wb = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        matched = u.withColumn(
            "_asof", F.last("_r0", ignorenulls=True).over(wb)
        )
    elif direction == "forward":
        matched = u.withColumn(
            "_asof", F.first("_r2", ignorenulls=True).over(wf)
        )
    else:
        bw = F.last("_r0", ignorenulls=True).over(wb)
        fw = F.first("_r2", ignorenulls=True).over(wf)
        matched = u.withColumn("_bw", bw).withColumn("_fw", fw).withColumn(
            "_asof",
            F.when(F.col("_bw").isNull(), F.col("_fw"))
            .when(F.col("_fw").isNull(), F.col("_bw"))
            .when(
                (F.col("_ts") - F.col("_bw")[ts_col])
                <= (F.col("_fw")[ts_col] - F.col("_ts")),
                F.col("_bw"),
            )
            .otherwise(F.col("_fw")),
        )
    matched = matched.filter(F.col("_side") == 1)
    if tolerance is not None:
        dist = F.when(
            F.col("_asof")[ts_col] <= F.col("_ts"),
            F.col("_ts") - F.col("_asof")[ts_col],
        ).otherwise(F.col("_asof")[ts_col] - F.col("_ts"))
        matched = matched.withColumn(
            "_asof",
            F.when(dist <= tolerance, F.col("_asof")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_asof.{c}").alias(f"{asof_prefix}{c}")
        for c in right.columns
        if c not in keys
    ]
    return matched.select(*out_cols)


def asof_topn(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    n: int,
    lookback_seconds: int,
    prefix: str = "prev_",
) -> DataFrame:
    """The feature-engineering staple the single-match as-of join
    can't express: for every left row, the ``n`` most recent right
    rows STRICTLY preceding it (in the total ``(ts, tiebreak)``
    order, so self/simultaneous rows never match) within a bounded
    ``lookback_seconds`` horizon — "the last 3 readings in the hour
    before each label". Returns one row per match: the left columns
    plus ``rank`` (1 = most recent) and ``prefix``-renamed right
    columns; left rows with no in-horizon predecessor emit nothing.

    Scale contract — the lookback bound is what makes this a join,
    not a blow-up: time is bucketed at the lookback width and each
    right row registers in its own bucket and the next, so every
    candidate pair shares a ``(keys…, bucket)`` equi-key (a left row
    in bucket b only ever looks back into b and b−1). One shuffle of
    2·|R| + |L| rows; the per-left top-n window runs over in-horizon
    candidates only — work ∝ rows-per-horizon-window, NEVER the full
    key history (an unbucketed r.ts ≤ l.ts lateral fans out
    quadratically on a long-lived key). Timestamps are compared at
    micros precision; everything is integer/lexicographic, so the
    match set is engine-exact.

    ``tiebreak_col`` must uniquely identify LEFT rows (it is the
    per-left-row window partition key) and totally order right rows
    at equal ts — the usual event-id contract."""
    lb = int(lookback_seconds) * 1_000_000
    lnum = F.unix_micros(F.col(ts_col))
    lft = left.select(
        "*",
        lnum.alias("_lts"),
        F.floor(lnum / F.lit(lb)).alias("_bucket"),
    )
    r_renamed = right.select(
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_rts"),
        F.col(tiebreak_col).alias("_rtie"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in right.columns
            if c not in key_cols
        ],
    )
    # each right row serves its own bucket and the next one
    rgt = r_renamed.select(
        "*",
        F.explode(
            F.array(
                F.floor(F.col("_rts") / F.lit(lb)),
                F.floor(F.col("_rts") / F.lit(lb)) + 1,
            )
        ).alias("_bucket"),
    )
    strictly_before = (F.col("_rts") < F.col("_lts")) | (
        (F.col("_rts") == F.col("_lts"))
        & (F.col("_rtie") < F.col(tiebreak_col))
    )
    in_horizon = F.col("_rts") >= F.col("_lts") - F.lit(lb)
    cand = lft.join(rgt, [*key_cols, "_bucket"]).filter(
        strictly_before & in_horizon
    )
    w = Window.partitionBy(tiebreak_col).orderBy(
        F.desc("_rts"), F.desc("_rtie")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(*left.columns, F.col("rank").cast("int").alias("rank"),
                *[c for c in r_renamed.columns if c.startswith(prefix)])
    )


def asof_intervals(
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    asof_prefix: str = "asof_",
) -> DataFrame:
    """Validity-interval form of the backward as-of relation:
    ``(keys, valid_from, valid_to, asof_<payload>…)`` such that a
    key + containment join (``valid_from <= l.ts AND (valid_to IS
    NULL OR l.ts < valid_to)``) reproduces
    ``asof_join(direction='backward')`` exactly — including the
    greatest-tiebreak rule at equal ts: intervals are cut by
    ``lead(ts)`` over ``(ts, tiebreak)`` order, so of several right
    rows sharing a ts only the greatest tiebreak gets a non-empty
    interval (the others span ``[ts, ts)``, which no left row can
    fall into).

    This is how as-of enrichment reaches STREAMS (st21): window
    functions don't run on streaming DataFrames, but the union-tag
    window only ever touches the right side's order — so convert the
    (static/maintained) right side to intervals once, batch-side,
    and let arriving facts join STATELESS on key + containment, the
    same micro-batch shape as st15's SCD2 lookup. A backward
    tolerance composes as one extra residual (``valid_from >=
    l.ts - tol``): the containment match is unique, so the residual
    can only null it out — exactly asof_join's match-then-null-out
    semantics, never a re-route to an older row.

    One batch shuffle (the window) on the right side only; the fact
    side never shuffles for the join when the interval relation
    broadcasts (dimension-sized), which is the 100 TB common case.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    payload = [c for c in right.columns if c not in keys]
    return right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        *[F.col(c).alias(f"{asof_prefix}{c}") for c in payload],
    )


def asof_window_agg(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    lookback_seconds: int,
) -> DataFrame:
    """Point-in-time window AGGREGATE — the feature-store primitive
    ("views in the 30 minutes before each purchase"): for every left
    row, the count and milli-quantized sum of right ``value_col``
    over right rows STRICTLY preceding it (the asof_topn total-order
    contract, so labels never leak their own instant) within the
    bounded lookback horizon. Unlike asof_topn, left rows with no
    predecessor DO emit (count 0) — a feature must exist for every
    training row — via one equi-join of the aggregated candidates
    back to the left relation on its unique tiebreak.

    Same scale contract as asof_topn: lookback-width buckets give
    every candidate pair a ``(keys…, bucket)`` equi-key, one shuffle
    of 2·|R| + |L| rows, work ∝ rows-per-horizon; the aggregation is
    map-side combinable per left row. All integer arithmetic
    (micros, milli-units), engine-exact.
    """
    lb = int(lookback_seconds) * 1_000_000
    lnum = F.unix_micros(F.col(ts_col))
    lft = left.select(
        "*",
        lnum.alias("_lts"),
        F.floor(lnum / F.lit(lb)).alias("_bucket"),
    )
    rgt = right.select(
        *key_cols,
        F.unix_micros(F.col(ts_col)).alias("_rts"),
        F.col(tiebreak_col).alias("_rtie"),
        F.floor(F.col(value_col) * F.lit(1000.0)).alias("_rvm"),
    ).select(
        "*",
        F.explode(
            F.array(
                F.floor(F.col("_rts") / F.lit(lb)),
                F.floor(F.col("_rts") / F.lit(lb)) + 1,
            )
        ).alias("_bucket"),
    )
    strictly_before = (F.col("_rts") < F.col("_lts")) | (
        (F.col("_rts") == F.col("_lts"))
        & (F.col("_rtie") < F.col(tiebreak_col))
    )
    in_horizon = F.col("_rts") >= F.col("_lts") - F.lit(lb)
    cand = lft.join(rgt, [*key_cols, "_bucket"]).filter(
        strictly_before & in_horizon
    )
    agg = cand.groupBy(F.col(tiebreak_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_prev"),
        F.sum("_rvm").cast("bigint").alias("sum_prev_milli"),
    )
    return (
        left.join(agg, left[tiebreak_col] == agg["_k"], "left")
        .drop("_k")
        .withColumn(
            "n_prev", F.coalesce("n_prev", F.lit(0)).cast("bigint")
        )
        .withColumn(
            "sum_prev_milli",
            F.coalesce("sum_prev_milli", F.lit(0)).cast("bigint"),
        )
    )
