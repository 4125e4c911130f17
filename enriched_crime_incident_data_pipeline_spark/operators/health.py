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


def schema_drift(
    events: DataFrame, props_col: str = "props", ts_col: str = "ts"
) -> DataFrame:
    """Snapshot-over-snapshot JSON schema drift — the run-report a
    lake actually wants from its semi-structured column (r7 verdict
    item 6): json2's key-domain profile computed AS OF two points in
    time and diffed with the cdc2 snapshot idiom.

    Snapshots are cumulative (a profile "as of T" sees all rows up to
    T): T2 = everything, T1 = rows at or before the integer epoch-µs
    midpoint ``(min+max) DIV 2`` — scale-free and engine-identical.
    Per key the output carries both snapshots' presence counts and
    dominant types (json2's pinned rule: count desc, name DESC on
    ties; NULL when the key is absent at T1) plus
    ``presence_drift_bp`` = (n₂·10⁴ DIV rows₂) − (n₁·10⁴ DIV rows₁),
    the integer-bp change in presence rate. ``status`` classifies:
    'added' (key unseen at T1), 'type_flip' (dominant type changed),
    else 'stable'. 'removed' cannot occur under append-only ingestion
    — cumulative snapshots only grow — and its absence is part of the
    contract (cdc2's exact argument).

    Plan shape: one tiny (min, max, count) aggregate over the
    pruned ts column, one count-at-or-before-cut scalar (ts column
    only), then ONE from_json + explode pass with per-key CONDITIONAL
    aggregation producing both snapshots' 6 counters in a single
    shuffle — the key domain, not the row count, bounds the output
    and the reduce state. Dominant types are row-local
    array_max(struct) epilogues over the aggregated counters.
    """
    ev = events.select(
        F.unix_micros(F.col(ts_col)).alias("t"), F.col(props_col).alias("p")
    )
    # lazily pin the 1-row bounds relation: three consumers (rows1,
    # the kv pass, the final epilogue) would otherwise each re-run
    # its events scan — 5 scans instead of 3 (measured in the r8
    # plan audit; the two that remain are the ts-pruned pre-passes)
    bounds = (
        ev.agg(
            F.min("t").alias("_mn"),
            F.max("t").alias("_mx"),
            F.count(F.lit(1)).cast("bigint").alias("_rows2"),
        )
        .select(
            F.expr("CAST((_mn + _mx) DIV 2 AS BIGINT)").alias("_cut"),
            "_rows2",
        )
        .localCheckpoint(eager=False)
    )
    rows1 = (
        ev.crossJoin(F.broadcast(bounds))
        .filter(F.col("t") <= F.col("_cut"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_rows1"))
    )
    kv = (
        ev.crossJoin(F.broadcast(bounds.select("_cut")))
        .select(
            "t",
            "_cut",
            F.explode(F.from_json(F.col("p"), "map<string,string>")).alias(
                "key", "val"
            ),
        )
    )
    ty = (
        F.when(F.col("val").isNull(), "null")
        .when(F.col("val").rlike("^-?[0-9]+$"), "int")
        .when(F.col("val").rlike("^-?[0-9]*\\.[0-9]+$"), "float")
        .when(F.col("val").isin("true", "false"), "bool")
        .otherwise("string")
    )
    in1 = (F.col("t") <= F.col("_cut")).cast("int")
    typed = kv.select("key", ty.alias("ty"), in1.alias("in1"))
    counts = typed.groupBy("key", "ty").agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("n2"),
    )
    return drift_from_type_counts(counts, rows1, bounds.select("_rows2"))


def drift_from_type_counts(
    counts: DataFrame, rows1: DataFrame, rows2: DataFrame
) -> DataFrame:
    """Schema-drift epilogue shared by batch dq10 and streaming st29:
    given the per-(key, value-type) snapshot counters ``(key, ty, n1,
    n2)`` — exactly the relation a streaming aggregation maintains as
    state, since integer counts merge in any micro-batch order — plus
    the one-cell event totals ``rows1`` (``_rows1``) / ``rows2``
    (``_rows2``), publish the per-key drift verdict. The key×type
    domain (≤ 5 types), not the event stream, bounds every relation
    here."""
    aggs = [
        F.sum("n1").cast("bigint").alias("n1"),
        F.sum("n2").cast("bigint").alias("n2"),
    ]
    for tname in ("int", "float", "bool", "null", "string"):
        hit = (F.col("ty") == tname).cast("bigint")
        aggs.append(F.sum(hit * F.col("n1")).cast("bigint").alias(f"a_{tname}"))
        aggs.append(F.sum(hit * F.col("n2")).cast("bigint").alias(f"b_{tname}"))
    per_key = counts.groupBy("key").agg(*aggs)

    def dom(prefix):
        cand = F.array(
            *[
                F.struct(
                    F.col(f"{prefix}_{tname}").alias("c"),
                    F.lit(tname).alias("t"),
                )
                for tname in ("bool", "float", "int", "null", "string")
            ]
        )
        return F.array_max(cand)["t"]

    out = (
        per_key.crossJoin(F.broadcast(rows2))
        .crossJoin(F.broadcast(rows1))
        .select(
            "key",
            F.col("n1").alias("n_t1"),
            F.col("n2").alias("n_t2"),
            F.when(F.col("n1") > 0, dom("a")).alias("dominant_t1"),
            dom("b").alias("dominant_t2"),
            F.expr(
                "CAST((n2 * 10000) DIV _rows2 - (n1 * 10000) DIV _rows1"
                " AS BIGINT)"
            ).alias("presence_drift_bp"),
        )
    )
    return out.select(
        "key",
        F.when(F.col("n_t1") == 0, F.lit("added"))
        .when(F.col("dominant_t1") != F.col("dominant_t2"), F.lit("type_flip"))
        .otherwise(F.lit("stable"))
        .alias("status"),
        "n_t1",
        "n_t2",
        "dominant_t1",
        "dominant_t2",
        "presence_drift_bp",
    )


def k_anonymity_report(groups: DataFrame, k: int = 5) -> DataFrame:
    """The dq11 release-bar summary over a quasi-identifier group-size
    relation (any columns + ``sz``): one row — total rows, group
    count, k-anonymity (min group size), max group, singleton groups,
    rows in groups below the ``k`` bar and their share in bp. The
    SHARED epilogue of batch ``dq11_k_anonymity`` and streaming
    ``st32_stream_k_anonymity`` — one code path, one oracle."""
    return groups.agg(
        F.sum("sz").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.max("sz").cast("bigint").alias("max_group"),
        F.sum((F.col("sz") == 1).cast("int")).cast("bigint").alias(
            "n_singleton_groups"
        ),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias(f"rows_below_k{k}"),
    ).select(
        "n_rows",
        "n_groups",
        "k_anonymity",
        "max_group",
        "n_singleton_groups",
        f"rows_below_k{k}",
        F.expr(
            f"CAST((rows_below_k{k} * 10000) DIV n_rows AS BIGINT)"
        ).alias("risk_share_bp"),
    )


def order_audit_report(per_user: DataFrame) -> DataFrame:
    """The dq12 summary over a per-user lateness relation
    ``(n_events, n_late, max_late_us)``: one row — events, late
    count/share (bp), worst lateness in whole seconds, users with any
    late event. The SHARED epilogue of batch ``dq12_event_order_audit``
    and streaming ``st33_stream_order_audit`` — one code path, one
    oracle."""
    return per_user.agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("n_late").cast("bigint").alias("n_late"),
        F.max("max_late_us").cast("bigint").alias("_max_late_us"),
        F.sum((F.col("n_late") > 0).cast("int")).cast("bigint").alias(
            "n_users_affected"
        ),
    ).select(
        "n_events",
        "n_late",
        F.expr("CAST((n_late * 10000) DIV n_events AS BIGINT)").alias(
            "late_share_bp"
        ),
        F.expr("CAST(_max_late_us DIV 1000000 AS BIGINT)").alias(
            "max_lateness_s"
        ),
        "n_users_affected",
    )
