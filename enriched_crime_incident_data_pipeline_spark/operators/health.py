"""Enrichment-health metrics (reference §2 P4/A5/A4).

The reference runs one ``COUNT(*) WHERE col IS NULL`` per column
(/root/reference/src/pipeline/main.py:108-112). Here all the
conditional counts fold into ONE aggregation pass — a single scan at
any scale instead of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_count_health(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: total_rows + null_<col> count per requested column."""
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"null_{c}")
        )
    return df.agg(*aggs)


def fd_audit(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Functional-dependency audit for the candidate FD ``lhs → rhs``:
    one row per ``lhs`` value with ``n_rows``, ``n_distinct_rhs``,
    the majority ``rhs`` (``majority_rhs`` — ties break on the lower
    value, so the result is a pure function of the data), and
    ``n_violations`` = rows that would need repair to make the FD
    hold (``n_rows − majority count``) — the standard
    FD-discovery/repair summary a data-quality sweep publishes.

    Shape: one ``(lhs, rhs)`` count aggregation (map-side combinable)
    followed by a per-``lhs`` reduce over the distinct-pair relation
    — the second aggregate sees one row per distinct pair, never the
    raw table. Everything is integer counts and comparisons:
    bit-exact cross-engine."""
    pair = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("_c"))
    return (
        pair.groupBy(lhs)
        .agg(
            F.sum("_c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_rhs"),
            F.min_by(
                rhs, F.struct((-F.col("_c")).alias("nc"), F.col(rhs))
            ).alias("majority_rhs"),
            (F.sum("_c") - F.max("_c")).cast("bigint").alias("_nv_min"),
        )
        .withColumnRenamed("_nv_min", "n_violations")
    )


def ks_drift(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per group: each
    group's ECDF of ``value_col`` vs the whole relation's, as
    ``(group, n_rows, ks_bp)`` with ``ks_bp = ⌊10⁴·sup|F_g − F|⌋``
    computed entirely in integer arithmetic.

    Exactness without densification: between two consecutive jump
    points of the group's step function F_g, F_g is constant while
    the global F rises monotonically, so |F_g − F| peaks at an
    interval endpoint. The right endpoint of interval [a, b) is
    exactly the "just-before" candidate of the next group point b
    (cum_g(b) − cnt_g(b) = cum_g(a); cum(b) − cnt(b) = cum just
    below b), and the initial interval is the first point's
    cum_g = 0 just-before candidate — so each group only ever
    touches its OWN (group, value) rows, never a group ×
    all-distinct-values product. Both candidates are row-local:
    ``D_at = |cum_g·N − cum·N_g|`` and
    ``D_before = |(cum_g−cnt_g)·N − (cum−cnt)·N_g|``; the single
    common denominator ``N_g·N`` keeps everything integer
    (decimal(38,0) headroom: N up to ~10¹⁷ before 10⁴·D overflows).

    Shuffle shape: two map-side-combinable groupBys over the
    DISTINCT-value relations (bounded by the value domain — a
    histogram's cardinality, not the row count), one equi-join on
    value. The one unpartitioned window runs over distinct values
    only, never over rows.
    """
    vals = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("x"))
    counts = vals.groupBy("g", "x").agg(F.count(F.lit(1)).alias("cnt_s"))
    return ks_drift_from_counts(counts, group_col)


def ks_drift_from_counts(
    counts: DataFrame, group_col: str = "g"
) -> DataFrame:
    """:func:`ks_drift` from a pre-aggregated per-(group, value)
    histogram ``(g, x, cnt_s)`` — the maintained STATE of a streaming
    drift monitor (st23): a continuous job keeps per-source value
    histograms as a streaming aggregation (state is |groups| × value
    domain, never rows), and this batch epilogue computes the exact
    KS statistic over that state on demand. The global histogram
    derives by summing over groups, so batch and stream agree by
    construction."""
    from pyspark.sql import Window

    # both branches derive from the SAME input relation (a memory-
    # sink table in the streaming caller), so rebase one side to
    # fresh attribute ids or the value equi-join self-references
    counts = counts.select(
        F.col("g").alias("g"), F.col("x").alias("x"), F.col("cnt_s")
    )
    g = counts.select("x", "cnt_s").groupBy("x").agg(
        F.sum("cnt_s").alias("cnt")
    )
    g = g.select(
        "x",
        "cnt",
        F.sum("cnt")
        .over(Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    s = counts.select(
        "g",
        "x",
        "cnt_s",
        F.sum("cnt_s")
        .over(
            Window.partitionBy("g")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum_s"),
    )
    ns = s.groupBy("g").agg(F.sum("cnt_s").alias("n_s"))
    tot = g.agg(F.sum("cnt").alias("n"))
    dec = "decimal(38,0)"
    d = (
        s.join(g, "x")
        .join(ns, "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            F.greatest(
                F.abs(
                    F.col("cum_s").cast(dec) * F.col("n").cast(dec)
                    - F.col("cum").cast(dec) * F.col("n_s").cast(dec)
                ),
                F.abs(
                    (F.col("cum_s") - F.col("cnt_s")).cast(dec)
                    * F.col("n").cast(dec)
                    - (F.col("cum") - F.col("cnt")).cast(dec)
                    * F.col("n_s").cast(dec)
                ),
            ).alias("d"),
        )
        .groupBy("g")
        .agg(F.max("d").alias("dmax"))
    )
    return (
        d.join(ns, "g")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            F.col("n_s").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST((dmax * 10000)"
                " DIV (CAST(n_s AS decimal(38,0))"
                " * CAST(n AS decimal(38,0))) AS BIGINT)"
            ).alias("ks_bp"),
        )
    )
