"""Exact-integer / exact-decimal statistics queries (stat1-stat5),
split out of registry/streaming.py when it crossed the 2,000-line
hygiene cap (r9; the r6 monolith-split rule in
test_registry_hygiene). Same queries, same oracles — a pure move."""

from __future__ import annotations

from pyspark.sql import Window  # noqa: F401  (used by moved queries)
from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table


def q_stat1_corr(spark, sf_dir):
    # Pearson correlation from exact decimal co-moments (built-in
    # corr() is float-sum order-dependent; this is engine-exact)
    from enriched_crime_incident_data_pipeline_spark.functions.stats import dec2

    li = load_table(spark, sf_dir, "lineitem")
    x = dec2(F.col("l_quantity"))
    y = dec2(F.col("l_extendedprice"))
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = n * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (n * d("sxx") - d("sx") * d("sx")) * (n * d("syy") - d("sy") * d("sy"))
    )
    return agg.select((num / den).alias("corr_qty_price"))


# ---------------------------------------------------------------------------
# structured streaming (bounded AvailableNow runs, oracle = batch twin)
# ---------------------------------------------------------------------------



def q_stat2_mad(spark, sf_dir):
    # median absolute deviation: two exact-percentile passes; the
    # per-group median broadcasts back onto the fact rows
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("absdev"),
        "med",
    )
    return dev.groupBy("l_returnflag").agg(
        F.first("med").alias("median_price"),
        F.expr("percentile(absdev, 0.5)").alias("mad"),
    )



def q_stat3_mode(spark, sf_dir):
    # per-group mode as an aggregation (max_by on (count, -value)):
    # map-side combinable, deterministic tie-break, no sort window
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.groupBy("l_returnflag").agg(
        F.expr(
            "max_by(l_quantity, struct(cnt, -l_quantity))"
        ).alias("mode_quantity"),
        F.max("cnt").alias("mode_count"),
    )



def q_stat4_gini(spark, sf_dir):
    # Gini impurity of the per-source language mix, computed from
    # exact integer count sums (1 - Σcnt²/total²) — no float
    # accumulation order anywhere
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_source = counts.groupBy("source").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
    )
    return per_source.select(
        "source",
        F.col("total").cast("int").alias("n_docs"),
        (
            F.lit(1.0)
            - F.col("sumsq").cast("double")
            / (F.col("total") * F.col("total")).cast("double")
        ).alias("gini"),
    )



def q_stat5_winsorize(spark, sf_dir):
    # winsorized (clamped-tail) mean per group: exact-percentile
    # bounds broadcast back onto the fact rows; the clamped sum is
    # decimal-exact (double→decimal(18,6) has no rounding ties — a
    # decimal tie needs a 5^k denominator no binary double can have)
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    joined = li.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return joined.groupBy("l_returnflag").agg(
        F.first("p05").alias("p05"),
        F.first("p95").alias("p95"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("p05"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_low"),
        F.sum(
            F.when(F.col("l_extendedprice") > F.col("p95"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_high"),
        (
            F.sum(clamped.cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )



QUERIES = {
    "stat1_corr": q_stat1_corr,
    "stat2_mad": q_stat2_mad,
    "stat3_mode": q_stat3_mode,
    "stat4_gini": q_stat4_gini,
    "stat5_winsorize": q_stat5_winsorize,
}


def oracles() -> dict[str, str]:
    return {
        "stat1_corr": """
                    WITH m AS (
                      SELECT count(*) AS n,
                             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                             sum(CAST(l_quantity AS DECIMAL(18,2))
                                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
                             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
                             sum(CAST(l_quantity AS DECIMAL(18,2))
                                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
                      FROM lineitem
                    )
                    SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                           AS corr_qty_price
                    FROM m
                """,
        "stat2_mad": """
                    WITH med AS (
                      SELECT l_returnflag,
                             quantile_cont(l_extendedprice, 0.5) AS med
                      FROM lineitem GROUP BY l_returnflag
                    )
                    SELECT l.l_returnflag,
                           any_value(m.med) AS median_price,
                           quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad
                    FROM lineitem l JOIN med m USING (l_returnflag)
                    GROUP BY l.l_returnflag
                """,
        "stat3_mode": """
                    WITH c AS (
                      SELECT l_returnflag, l_quantity, count(*) AS cnt
                      FROM lineitem GROUP BY l_returnflag, l_quantity
                    )
                    SELECT l_returnflag, l_quantity AS mode_quantity,
                           cnt AS mode_count
                    FROM (SELECT *, row_number() OVER (
                            PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity ASC) AS rn
                          FROM c)
                    WHERE rn = 1
                """,
        "stat4_gini": """
                    WITH c AS (
                      SELECT source, lang, count(*) AS cnt
                      FROM documents GROUP BY source, lang
                    ),
                    s AS (
                      SELECT source, sum(cnt) AS total, sum(cnt * cnt) AS sumsq
                      FROM c GROUP BY source
                    )
                    SELECT source, CAST(total AS INTEGER) AS n_docs,
                           1.0 - CAST(sumsq AS DOUBLE)
                               / CAST(total * total AS DOUBLE) AS gini
                    FROM s
                """,
        "stat5_winsorize": """
                    WITH bounds AS (
                      SELECT l_returnflag,
                             quantile_cont(l_extendedprice, 0.05) AS p05,
                             quantile_cont(l_extendedprice, 0.95) AS p95
                      FROM lineitem GROUP BY l_returnflag
                    )
                    SELECT l.l_returnflag,
                           max(p05) AS p05, max(p95) AS p95,
                           CAST(sum(CASE WHEN l_extendedprice < p05
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                           CAST(sum(CASE WHEN l_extendedprice > p95
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                           CAST(sum(CAST(least(greatest(l_extendedprice, p05), p95)
                                    AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                             AS winsorized_mean
                    FROM lineitem l JOIN bounds b USING (l_returnflag)
                    GROUP BY l.l_returnflag
                """,
    }
