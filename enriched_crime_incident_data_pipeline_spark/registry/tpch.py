"""TPC-H shapes q1-q22 over the driver parquet tables.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _dec,
    _rev_expr,
)




def q_tpch_q1(spark, sf_dir):
    # decimal-exact aggregates (see module docstring) — bench headline
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    filtered = li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
    return (
        filtered.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                d("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - d("l_discount"))
                * (F.lit(1).cast("decimal(18,2)") + d("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(d("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(d("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(d("l_discount")).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# multi-join OLAP (TPC-H shapes over the star schema)
# ---------------------------------------------------------------------------


def q_tpch_q3(spark, sf_dir):
    # shipping-priority shape: 3-way join, decimal-exact revenue, top-10
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cut = F.lit("1997-03-15")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.to_date("o_orderdate") < cut)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.to_date("l_shipdate") > cut)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    # local-supplier-volume shape: 6-way join; region/nation dims are
    # broadcast, the fact-side joins shuffle on their keys
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


def q_tpch_q6(spark, sf_dir):
    # forecast-revenue shape: single scan, every predicate pushed to
    # the parquet reader, one partial+final agg — zero joins, zero
    # wide shuffles beyond the 1-row final combine
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


def q_tpch_q10(spark, sf_dir):
    # returned-item reporting: fact-fact shuffle join + broadcast dim,
    # top-20 with a total tiebreak order so the cut is deterministic
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-07-01"))
            & (F.to_date("o_orderdate") < F.lit("1996-10-01"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_expr()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


def q_tpch_q13(spark, sf_dir):
    # customer-distribution shape: LEFT OUTER join with an ON-clause
    # filter (not WHERE — nulls must survive), then a two-level agg
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q_tpch_q14(spark, sf_dir):
    # promo-effect shape: conditional aggregate ratio; both sums stay
    # decimal-exact until the single final double division
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _rev_expr()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-09-01"))
            & (F.to_date("l_shipdate") < F.lit("1996-10-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


def q_tpch_q15(spark, sf_dir):
    # top-supplier shape: agg → scalar max → broadcast equality join
    # back (no global window, no single-partition collapse).  The
    # explicit isNotNull on the group key matters: the supplier join
    # infers it on one consumer of `rev` but not the other, and the
    # mismatched Filter defeats exchange reuse — with it stated once
    # here, both consumers canonicalize equal and the lineitem
    # scan+partial-agg shuffle executes ONCE (ReusedExchange,
    # asserted in test_scale_ops.py) instead of twice.
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_expr()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17(spark, sf_dir):
    # small-quantity-order shape: the correlated AVG subquery becomes
    # a per-part aggregate joined back; the brand filter is applied
    # BEFORE the avg so only the brand's lineitems are aggregated
    # (equivalent: the correlation key is p_partkey).  l_quantity is
    # integer-valued so the avg is exact in both engines.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_brand = li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
    thresh = li_brand.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("_thresh")
    ).withColumnRenamed("l_partkey", "_tk")
    return (
        li_brand.join(thresh, F.col("l_partkey") == F.col("_tk"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


def q_tpch_q18(spark, sf_dir):
    # large-volume-customer shape: HAVING on a grouped sum feeding a
    # semi-style join; sum_qty is integer-valued hence exact
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_tpch_q19(spark, sf_dir):
    # disjunctive-predicate shape: three brand/size/quantity bands
    # OR-ed together after a broadcast part join — Catalyst keeps the
    # common l_partkey=p_partkey conjunct as the join key and the
    # disjunction as a post-join filter
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            band("Brand#13", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#20", 15, 20, 30)
        )
        .agg(F.sum(_rev_expr()).cast("double").alias("revenue"))
    )


def q_tpch_q4(spark, sf_dir):
    # order-priority checking; the reduced schema has no
    # commit/receipt dates, so the EXISTS predicate is adapted to
    # "has a returned lineitem" — same semi-join + agg shape
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1995-04-01"))
    )
    flagged = window.join(
        li.filter(F.col("l_returnflag") == "R"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_tpch_q7(spark, sf_dir):
    # volume shipping between two nations: fact-fact joins shuffle on
    # their keys, both nation dims broadcast; symmetric nation-pair
    # disjunction applied after the joins
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.filter(
            F.to_date("l_shipdate").between("1995-01-01", "1996-12-31")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(F.sum(_rev_expr()).cast("double").alias("revenue"))


def q_tpch_q8(spark, sf_dir):
    # national market share: ratio of two decimal-exact sums per
    # year — conditional aggregation, no second pass over the join
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    cust_region = (
        cust.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    joined = (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.filter(
                F.to_date("o_orderdate").between("1995-01-01", "1996-12-31")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp_nation),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    vol = _rev_expr()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (F.sum(target).cast("double") / F.sum(vol).cast("double")).alias(
            "mkt_share"
        )
    )


def q_tpch_q22(spark, sf_dir):
    # global-market-candidate shape: scalar-subquery threshold
    # (computed as one double division of decimal-exact sum/count so
    # both engines agree bit-for-bit) + anti-join + group agg
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_thresh")
    )
    rich = cust.crossJoin(F.broadcast(stats)).filter(F.col("c_acctbal") > F.col("_thresh"))
    quiet = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return quiet.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


def q_tpch_q2(spark, sf_dir):
    # min-cost-supplier shape (adapted: the testdata has no partsupp
    # table, so the supply cost of a (part, supplier) pair is their
    # min observed unit price in lineitem).  The correlated-min
    # subquery becomes a per-part aggregate joined back on cost
    # equality — the scale-safe formulation (no per-row re-scan).
    # Unit price is one IEEE double division, identical cross-engine.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eur = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    target = part.filter(
        (F.col("p_size") == 15) & F.col("p_type").startswith("S")
    ).select("p_partkey")
    cost_t = cost.join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
    best = cost_t.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("supplycost").alias("_min_cost")
    )
    return (
        cost_t.join(
            best,
            (F.col("l_partkey") == F.col("_pk"))
            & (F.col("supplycost") == F.col("_min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q9(spark, sf_dir):
    # product-type-profit shape (adapted: cost side uses
    # 0.1 * p_retailprice * l_quantity in place of ps_supplycost).
    # Revenue and cost are separate decimal-exact sums cast to double
    # before the double subtract/multiply, so both engines agree
    # bit-for-bit.  Profit per (supplier nation, order year).
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red = part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    return (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(
            (
                F.sum(_rev_expr()).cast("double")
                - F.sum(_dec("p_retailprice") * _dec("l_quantity")).cast("double")
                * F.lit(0.1)
            ).alias("sum_profit")
        )
    )


def q_tpch_q11(spark, sf_dir):
    # important-stock shape (adapted: a part's "stock value" is the
    # decimal-exact revenue its NATION_3-supplied lineitems produced).
    # The scalar-subquery threshold is 2x the mean per-part value —
    # scale-free where the canonical fixed fraction degenerates as
    # the part count grows (canonical TPC-H scales it by 1/SF for the
    # same reason).  The threshold is a 1-row broadcast cross join;
    # per-part and global sums are independently exact, so the double
    # compare is deterministic cross-engine.
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n7 = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    li_n7 = li.join(F.broadcast(n7), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = li_n7.groupBy("l_partkey").agg(
        F.sum(_rev_expr()).cast("double").alias("part_value")
    )
    total = li_n7.agg(
        (
            F.sum(_rev_expr()).cast("double")
            * F.lit(2.0)
            / F.countDistinct("l_partkey")
        ).alias("_thresh")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_thresh"))
        .select("l_partkey", "part_value")
    )


def q_tpch_q12(spark, sf_dir):
    # shipmode-priority shape (adapted: l_returnflag stands in for
    # the missing l_shipmode).  Fact-fact join + CASE-conditional
    # counts, the canonical map-side-combine aggregation.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q16(spark, sf_dir):
    # parts/supplier-relationship shape (adapted: supplier exclusion
    # is s_acctbal < 1000 in place of the comment LIKE; the pair
    # relation comes from lineitem instead of partsupp).  NOT-IN
    # subquery becomes a broadcast anti-join; COUNT(DISTINCT) groups
    # by the part descriptor.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    excluded = supp.filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    keep_parts = part.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(keep_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q20(spark, sf_dir):
    # potential-promotion shape (adapted: a supplier qualifies when
    # it shipped > 30% of some red part's total 1996 volume).  The
    # nested IN-with-correlated-aggregate becomes per-(supp, part)
    # sums joined to per-part totals, then a semi-join to suppliers.
    # l_quantity is integer-valued so the double sums are exact.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    red = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    li96 = li.filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    ).join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
    per_sp = li96.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = li96.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    qualifying = (
        per_sp.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    asia = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        asia.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_name")
    )


def q_tpch_q21(spark, sf_dir):
    # waiting-supplier shape (adapted: l_returnflag = 'R' marks the
    # "failed" lineitem in place of receipt > commit).  The canonical
    # EXISTS / NOT-EXISTS double self-join over the fact table is
    # re-founded as ONE per-order aggregate (distinct suppliers,
    # distinct returning suppliers) — the fact table is scanned once
    # and never self-joined, which is the 100 TB-safe plan.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    lf = li.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = lf.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    waits = (
        lf.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
    )
    return (
        waits.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )

QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q10": q_tpch_q10,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
}

def oracles() -> dict[str, str]:
    return {
        "tpch_q1": """
                    SELECT l_returnflag, l_linestatus,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                           AS DOUBLE) AS sum_disc_price,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                           * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
                           AS DOUBLE) AS sum_charge,
                      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
                      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
                      count(*) AS count_order
                    FROM lineitem
                    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
                    GROUP BY l_returnflag, l_linestatus
                """,
        "tpch_q3": """
                    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                           AS DOUBLE) AS revenue
                    FROM customer
                    JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    WHERE c_mktsegment = 'BUILDING'
                      AND CAST(o_orderdate AS DATE) < DATE '1997-03-15'
                      AND CAST(l_shipdate AS DATE) > DATE '1997-03-15'
                    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
                    ORDER BY revenue DESC, l_orderkey LIMIT 10
                """,
        "tpch_q5": """
                    SELECT n_name,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                           AS DOUBLE) AS revenue
                    FROM customer
                    JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA'
                      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
                    GROUP BY n_name
                """,
        "tpch_q6": """
                    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                    FROM lineitem
                    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                      AND l_discount >= 0.05 AND l_discount <= 0.07
                      AND l_quantity < 24
                """,
        "tpch_q10": """
                    SELECT c_custkey, c_name, revenue, c_acctbal, n_name FROM (
                      SELECT c_custkey, c_name, c_acctbal, n_name,
                        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                             AS DOUBLE) AS revenue
                      FROM customer
                      JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
                      WHERE l_returnflag = 'R'
                        AND CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
                        AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
                      GROUP BY c_custkey, c_name, c_acctbal, n_name
                      ORDER BY revenue DESC, c_custkey LIMIT 20
                    )
                """,
        "tpch_q13": """
                    SELECT c_count, count(*) AS custdist FROM (
                      SELECT c_custkey, count(o_orderkey) AS c_count
                      FROM customer LEFT OUTER JOIN orders
                        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                      GROUP BY c_custkey
                    ) GROUP BY c_count
                """,
        "tpch_q14": """
                    SELECT 100.0
                      * CAST(sum(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                      / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                            AS DOUBLE) AS promo_revenue
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
                      AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
                """,
        "tpch_q15": """
                    WITH revenue AS (
                      SELECT l_suppkey,
                        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                             AS DOUBLE) AS total_revenue
                      FROM lineitem
                      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
                      GROUP BY l_suppkey
                    )
                    SELECT s_suppkey, s_name, total_revenue
                    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
                    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
                """,
        "tpch_q17": """
                    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                           AS avg_yearly
                    FROM lineitem JOIN part ON p_partkey = l_partkey
                    WHERE p_brand = 'Brand#23'
                      AND l_quantity < (
                        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey
                      )
                """,
        "tpch_q18": """
                    SELECT c_custkey, c_name, o_orderkey,
                           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
                    FROM orders
                    JOIN (
                      SELECT l_orderkey, sum(l_quantity) AS sum_qty
                      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
                    ) big ON o_orderkey = big.l_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
                """,
        "tpch_q19": """
                    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                         AS DOUBLE) AS revenue
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 5
                           AND l_quantity BETWEEN 1 AND 11)
                       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                           AND l_quantity BETWEEN 10 AND 20)
                       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
                           AND l_quantity BETWEEN 20 AND 30)
                """,
        "tpch_q22": """
                    WITH stats AS (
                      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                             AS thresh
                      FROM customer WHERE c_acctbal > 0
                    )
                    SELECT c_nationkey, count(*) AS numcust,
                           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
                    FROM customer, stats
                    WHERE c_acctbal > thresh
                      AND NOT EXISTS (
                        SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                      )
                    GROUP BY c_nationkey
                """,
        "tpch_q2": """
                    WITH eur AS (
                      SELECT s_suppkey, s_name, s_acctbal, n_name
                      FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'EUROPE'
                    ),
                    cost AS (
                      SELECT l_partkey, s_name, s_acctbal, n_name,
                             min(l_extendedprice / l_quantity) AS supplycost
                      FROM lineitem JOIN eur ON l_suppkey = s_suppkey
                      GROUP BY l_partkey, s_name, s_acctbal, n_name
                    )
                    SELECT s_acctbal, s_name, n_name, p_partkey, supplycost
                    FROM part JOIN cost ON p_partkey = l_partkey
                    WHERE p_size = 15 AND p_type LIKE 'S%'
                      AND supplycost = (
                        SELECT min(c2.supplycost) FROM cost c2
                        WHERE c2.l_partkey = p_partkey
                      )
                    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
                """,
        "tpch_q9": """
                    SELECT n_name AS nation,
                           year(CAST(o_orderdate AS DATE)) AS o_year,
                           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                                AS DOUBLE)
                           - CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))
                                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.1
                             AS sum_profit
                    FROM lineitem
                    JOIN part ON l_partkey = p_partkey
                    JOIN orders ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    WHERE p_name LIKE '%red%'
                    GROUP BY n_name, year(CAST(o_orderdate AS DATE))
                """,
        "tpch_q11": """
                    WITH li_n7 AS (
                      SELECT l_partkey,
                             CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                             AS amt
                      FROM lineitem
                      JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_3'
                    )
                    SELECT l_partkey, CAST(sum(amt) AS DOUBLE) AS part_value
                    FROM li_n7
                    GROUP BY l_partkey
                    HAVING CAST(sum(amt) AS DOUBLE)
                           > (SELECT CAST(sum(amt) AS DOUBLE) * 2.0
                                     / count(DISTINCT l_partkey) FROM li_n7)
                """,
        "tpch_q12": """
                    SELECT l_returnflag AS ship_class,
                           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS high_line_count,
                           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               THEN 0 ELSE 1 END) AS low_line_count
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    WHERE l_returnflag IN ('A', 'R')
                      AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                    GROUP BY l_returnflag
                """,
        "tpch_q16": """
                    SELECT p_brand, p_type, p_size,
                           count(DISTINCT l_suppkey) AS supplier_cnt
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_brand <> 'Brand#13'
                      AND p_type <> 'PROMO'
                      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
                      AND l_suppkey NOT IN (
                        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
                      )
                    GROUP BY p_brand, p_type, p_size
                """,
        "tpch_q20": """
                    SELECT s_suppkey, s_name
                    FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA'
                      AND s_suppkey IN (
                        SELECT l_suppkey
                        FROM lineitem JOIN part ON l_partkey = p_partkey
                        WHERE p_name LIKE '%red%'
                          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                        GROUP BY l_suppkey, l_partkey
                        HAVING sum(l_quantity) > 0.3 * (
                          SELECT sum(l2.l_quantity) FROM lineitem l2 JOIN part p2
                            ON l2.l_partkey = p2.p_partkey
                          WHERE l2.l_partkey = lineitem.l_partkey
                            AND p2.p_name LIKE '%red%'
                            AND CAST(l2.l_shipdate AS DATE) >= DATE '1996-01-01'
                            AND CAST(l2.l_shipdate AS DATE) < DATE '1997-01-01'
                        )
                      )
                    ORDER BY s_name
                """,
        "tpch_q21": """
                    SELECT s_name, count(*) AS numwait
                    FROM (
                      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
                      FROM lineitem l1
                      JOIN orders ON o_orderkey = l1.l_orderkey
                      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
                        AND EXISTS (
                          SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey
                        )
                        AND NOT EXISTS (
                          SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R'
                        )
                    ) w JOIN supplier ON s_suppkey = w.l_suppkey
                    GROUP BY s_name
                    ORDER BY numwait DESC, s_name LIMIT 100
                """,
        "tpch_q4": """
                    SELECT o_orderpriority, count(*) AS order_count
                    FROM orders
                    WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
                      AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
                      AND EXISTS (SELECT 1 FROM lineitem
                                  WHERE l_orderkey = o_orderkey
                                    AND l_returnflag = 'R')
                    GROUP BY o_orderpriority
                """,
        "tpch_q7": """
                    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                           CAST(year(l_shipdate) AS INTEGER) AS l_year,
                           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                * (1 - CAST(l_discount AS DECIMAL(18,2))))
                                AS DOUBLE) AS revenue
                    FROM supplier, lineitem, orders, customer,
                         nation n1, nation n2
                    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                      AND c_custkey = o_custkey
                      AND s_nationkey = n1.n_nationkey
                      AND c_nationkey = n2.n_nationkey
                      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                      AND CAST(l_shipdate AS DATE)
                            BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
                    GROUP BY 1, 2, 3
                """,
        "tpch_q8": """
                    WITH joined AS (
                      SELECT year(o_orderdate) AS o_year,
                             CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                             n2.n_name AS supp_nation
                      FROM lineitem
                      JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
                      JOIN orders ON l_orderkey = o_orderkey
                      JOIN customer ON o_custkey = c_custkey
                      JOIN nation n1 ON c_nationkey = n1.n_nationkey
                      JOIN region ON n1.n_regionkey = r_regionkey
                                 AND r_name = 'AMERICA'
                      JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation n2 ON s_nationkey = n2.n_nationkey
                      WHERE CAST(o_orderdate AS DATE)
                              BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
                    )
                    SELECT CAST(o_year AS INTEGER) AS o_year,
                           CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                         THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END)
                                AS DOUBLE)
                             / CAST(sum(volume) AS DOUBLE) AS mkt_share
                    FROM joined GROUP BY o_year
                """,
    }
