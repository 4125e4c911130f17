"""Skew/layout tools: salted aggregates/joins (sj*), Z-order tiles (zo*).

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _MORTON7_SQL,
)




def q_sj1_salted_hot_agg(spark, sf_dir):
    # skew-resistant two-phase aggregation as a user-visible query:
    # 90% of events collapse onto one synthetic hot key (the
    # power-law shape AQE does NOT rebalance for aggregation state);
    # salted_agg splits the hot key across (key, salt) partials so no
    # reducer holds more than ~1/n_salts of it, then combines — both
    # shuffles move only partial rows. Aggregates are count/min/max
    # (algebraic, order-insensitive), so the result is bit-equal to
    # the direct groupBy the oracle runs.
    from enriched_crime_incident_data_pipeline_spark.operators.skew import (
        salted_agg,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "k",
        F.when(F.col("event_id") % 100 < 90, F.lit("hot")).otherwise(
            F.col("event_type")
        ),
    )
    return salted_agg(
        e,
        "k",
        {
            "_c": F.count(F.lit(1)),
            "_mn": F.min("event_id"),
            "_mx": F.max("event_id"),
        },
        {
            "cnt": F.sum("_c").cast("bigint"),
            "min_id": F.min("_mn").cast("bigint"),
            "max_id": F.max("_mx").cast("bigint"),
        },
        n_salts=16,
    )


def q_sj2_salted_join(spark, sf_dir):
    # skew-resistant shuffle join as a user-visible query: the big
    # side's synthetic hot key (90% of rows) would pile onto one
    # reducer in a plain shuffle join; salted_join spreads it over
    # n_salts reducers by salting the big side and replicating the
    # small side once per salt — the exact join result, pinned here
    # against the oracle's plain join.
    from enriched_crime_incident_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 100 < 90, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("k"),
    )
    dim = e.select("k").distinct().select(
        "k", F.length("k").cast("int").alias("w")
    )
    return salted_join(e, dim, "k", n_salts=8).select("event_id", "k", "w")


def q_zo1_zorder_tiles(spark, sf_dir):
    # z-order (Morton) clustering as a user-visible query: interleave
    # the bits of two independent point coordinates into one sort
    # key, bucket contiguous z-ranges into tiles, and report each
    # tile's min/max per axis — the parquet-footer bounding boxes a
    # z-ordered layout gives a reader. Tight tiles (max-min ≈ 7 on
    # both axes for an 8×8 tile) are exactly why a range predicate on
    # EITHER axis can skip most files. Tiles are fixed z-prefix
    # buckets (code >> 6), not sampled range boundaries, so the
    # assignment is deterministic and the oracle reproduces it with
    # the same bit math.
    from enriched_crime_incident_data_pipeline_spark.sinks.zorder import (
        morton_code,
    )

    pts = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 89).cast("long").alias("px"),
        (F.col("c_custkey") % 97).cast("long").alias("py"),
    )
    return (
        pts.withColumn("z", morton_code(F.col("px"), F.col("py"), bits=7))
        .groupBy(F.shiftright(F.col("z"), 6).cast("bigint").alias("tile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("px").cast("bigint").alias("min_px"),
            F.max("px").cast("bigint").alias("max_px"),
            F.min("py").cast("bigint").alias("min_py"),
            F.max("py").cast("bigint").alias("max_py"),
        )
    )

def q_zo2_skipping_audit(spark, sf_dir):
    # data-skipping effectiveness audit — the number a layout
    # decision is actually judged by: for a range predicate on each
    # axis, how many tiles (parquet footers) does the reader scan
    # and how many rows ride along, under (a) the z-ordered layout
    # vs (b) the insertion-ordered layout. Z-order keeps BOTH axes'
    # per-tile bounds tight, so either predicate skips most tiles;
    # insertion order leaves px/py cycling through their full range
    # inside every tile (min≈0, max≈domain) and skips nothing — the
    # audit makes that a measured, oracle-checked fact, not a claim.
    # Shape: two tile-stat groupBys over the point relation (tile-
    # domain partials, map-side combinable) + per-predicate
    # aggregations over the TINY tile relations + one map-side
    # matching-row count; all integers.
    from enriched_crime_incident_data_pipeline_spark.sinks.zorder import (
        morton_code,
    )

    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 89).cast("long").alias("px"),
        (F.col("c_custkey") % 97).cast("long").alias("py"),
    )

    def tile_stats(tile_col):
        return (
            pts.groupBy(tile_col.alias("tile"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("px").alias("min_px"),
                F.max("px").alias("max_px"),
                F.min("py").alias("min_py"),
                F.max("py").alias("max_py"),
            )
        )

    zcode = morton_code(F.col("px"), F.col("py"), bits=7)
    layouts = {
        "zorder": tile_stats(F.shiftright(zcode, 6).cast("bigint")),
        "insertion": tile_stats(
            F.expr("CAST(k DIV 64 AS BIGINT)")
        ),
    }
    preds = {"px_10_19": ("px", 10, 19), "py_40_49": ("py", 40, 49)}

    outs = []
    for lname, tiles in layouts.items():
        for pname, (ax, lo, hi) in preds.items():
            scanned = (F.col(f"min_{ax}") <= hi) & (
                F.col(f"max_{ax}") >= lo
            )
            outs.append(
                tiles.agg(
                    F.lit(lname).alias("layout"),
                    F.lit(pname).alias("predicate"),
                    F.count(F.lit(1)).cast("bigint").alias("n_tiles"),
                    F.sum(scanned.cast("int")).cast("bigint").alias(
                        "tiles_scanned"
                    ),
                    F.sum(
                        F.when(scanned, F.col("n_rows")).otherwise(0)
                    ).cast("bigint").alias("rows_scanned"),
                )
            )
    audit = outs[0]
    for o in outs[1:]:
        audit = audit.unionByName(o)
    match = [
        pts.agg(
            F.lit(pname).alias("predicate"),
            F.sum(
                (
                    (F.col(ax) >= lo) & (F.col(ax) <= hi)
                ).cast("int")
            ).cast("bigint").alias("rows_matching"),
        )
        for pname, (ax, lo, hi) in preds.items()
    ]
    m = match[0].unionByName(match[1])
    return audit.join(F.broadcast(m), "predicate").select(
        "layout", "predicate", "n_tiles", "tiles_scanned",
        "rows_scanned", "rows_matching",
    )


def q_sj3_salt_factor_curve(spark, sf_dir):
    # the SALT-FACTOR sizing artifact (r10; er5/geo3's idiom for the
    # skew family): sj1/sj2 fix n_salts at 16/8 — this prices the
    # knob BEFORE running, from the key histogram alone. Per salt
    # factor s = 1/4/16, the ideal-split reducer profile over sj1's
    # synthetic 90%-hot key distribution: the largest (key, salt)
    # bucket is ceil(c_max/s) rows, its share of the shuffle is the
    # residual skew s can't remove, and the bucket count Σ min(s, c)
    # is the state-fan-out cost salting ADDS. s=1 is the unsalted
    # baseline (one reducer holds 90% of the shuffle); the curve
    # shows the knee where more salts stop buying balance. ONE key
    # groupBy (map-side combinable), every s a conditional cell of
    # ONE 1-row aggregate over the key-domain relation, stacked.
    e = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 100 < 90, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("k")
    )
    counts = e.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    factors = (1, 4, 16)
    cells = [
        F.count(F.lit(1)).cast("bigint").alias("_n_keys"),
        F.sum("c").cast("bigint").alias("_total_rows"),
        F.max("c").cast("bigint").alias("_max_key_rows"),
    ]
    for s in factors:
        cells.append(
            F.max(F.expr(f"(c + {s} - 1) DIV {s}"))
            .cast("bigint")
            .alias(f"_mb{s}")
        )
        cells.append(
            F.sum(F.least(F.lit(s).cast("bigint"), F.col("c")))
            .cast("bigint")
            .alias(f"_nb{s}")
        )
    one = counts.agg(*cells)
    return one.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{s}, _mb{s}, _nb{s}" for s in factors)
            + ") AS (n_salts, max_bucket_rows, n_buckets)"
        ),
        "_n_keys",
        "_total_rows",
        "_max_key_rows",
    ).select(
        F.col("n_salts").cast("int").alias("n_salts"),
        F.col("_n_keys").alias("n_keys"),
        F.col("_total_rows").alias("total_rows"),
        F.col("_max_key_rows").alias("max_key_rows"),
        "n_buckets",
        "max_bucket_rows",
        F.expr(
            "CAST((max_bucket_rows * 10000) DIV _total_rows AS BIGINT)"
        ).alias("max_bucket_share_bp"),
    )


QUERIES = {
    "sj3_salt_factor_curve": q_sj3_salt_factor_curve,
    "zo2_skipping_audit": q_zo2_skipping_audit,
    "sj1_salted_hot_agg": q_sj1_salted_hot_agg,
    "sj2_salted_join": q_sj2_salted_join,
    "zo1_zorder_tiles": q_zo1_zorder_tiles,
}

def oracles() -> dict[str, str]:
    return {
        "sj3_salt_factor_curve": """
            WITH ek AS (
              SELECT CASE WHEN event_id % 100 < 90 THEN 'hot'
                     ELSE event_type END AS k
              FROM events
            ),
            counts AS (
              SELECT k, CAST(count(*) AS BIGINT) AS c
              FROM ek GROUP BY k
            ),
            agg AS MATERIALIZED (
              SELECT CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(c) AS BIGINT) AS total_rows,
                     CAST(max(c) AS BIGINT) AS max_key_rows,
                     CAST(max((c + 0) // 1) AS BIGINT) AS mb1,
                     CAST(sum(least(1, c)) AS BIGINT) AS nb1,
                     CAST(max((c + 3) // 4) AS BIGINT) AS mb4,
                     CAST(sum(least(4, c)) AS BIGINT) AS nb4,
                     CAST(max((c + 15) // 16) AS BIGINT) AS mb16,
                     CAST(sum(least(16, c)) AS BIGINT) AS nb16
              FROM counts
            )
            SELECT CAST(n_salts AS INTEGER) AS n_salts, n_keys,
                   total_rows, max_key_rows, n_buckets, max_bucket_rows,
                   CAST((max_bucket_rows * 10000) // total_rows AS BIGINT)
                     AS max_bucket_share_bp
            FROM (
              SELECT 1 AS n_salts, n_keys, total_rows, max_key_rows,
                     nb1 AS n_buckets, mb1 AS max_bucket_rows FROM agg
              UNION ALL SELECT 4, n_keys, total_rows, max_key_rows,
                     nb4, mb4 FROM agg
              UNION ALL SELECT 16, n_keys, total_rows, max_key_rows,
                     nb16, mb16 FROM agg
            )
""",
        "sj1_salted_hot_agg": """
                    SELECT CASE WHEN event_id % 100 < 90 THEN 'hot'
                                ELSE event_type END AS k,
                           CAST(count(*) AS BIGINT) AS cnt,
                           CAST(min(event_id) AS BIGINT) AS min_id,
                           CAST(max(event_id) AS BIGINT) AS max_id
                    FROM events GROUP BY 1
                """,
        "sj2_salted_join": """
                    WITH e AS (
                      SELECT event_id,
                             CASE WHEN event_id % 100 < 90 THEN 'hot'
                                  ELSE event_type END AS k
                      FROM events
                    ),
                    dim AS (
                      SELECT k, CAST(length(k) AS INTEGER) AS w
                      FROM (SELECT DISTINCT k FROM e)
                    )
                    SELECT e.event_id, e.k, dim.w FROM e JOIN dim USING (k)
                """,
        "zo2_skipping_audit": f"""
                    WITH pts AS (
                      SELECT c_custkey AS k,
                             CAST(c_custkey % 89 AS BIGINT) AS px,
                             CAST(c_custkey % 97 AS BIGINT) AS py
                      FROM customer
                    ),
                    coded AS (
                      SELECT k, px, py, ({_MORTON7_SQL}) AS z FROM pts
                    ),
                    zt AS (
                      SELECT z >> 6 AS tile, count(*) AS n_rows,
                             min(px) AS min_px, max(px) AS max_px,
                             min(py) AS min_py, max(py) AS max_py
                      FROM coded GROUP BY 1
                    ),
                    it AS (
                      SELECT k // 64 AS tile, count(*) AS n_rows,
                             min(px) AS min_px, max(px) AS max_px,
                             min(py) AS min_py, max(py) AS max_py
                      FROM coded GROUP BY 1
                    ),
                    audit AS (
                      SELECT 'zorder' AS layout, 'px_10_19' AS predicate,
                             count(*) AS n_tiles,
                             sum(CASE WHEN min_px <= 19 AND max_px >= 10
                                 THEN 1 ELSE 0 END) AS tiles_scanned,
                             sum(CASE WHEN min_px <= 19 AND max_px >= 10
                                 THEN n_rows ELSE 0 END) AS rows_scanned
                      FROM zt
                      UNION ALL
                      SELECT 'zorder', 'py_40_49', count(*),
                             sum(CASE WHEN min_py <= 49 AND max_py >= 40
                                 THEN 1 ELSE 0 END),
                             sum(CASE WHEN min_py <= 49 AND max_py >= 40
                                 THEN n_rows ELSE 0 END)
                      FROM zt
                      UNION ALL
                      SELECT 'insertion', 'px_10_19', count(*),
                             sum(CASE WHEN min_px <= 19 AND max_px >= 10
                                 THEN 1 ELSE 0 END),
                             sum(CASE WHEN min_px <= 19 AND max_px >= 10
                                 THEN n_rows ELSE 0 END)
                      FROM it
                      UNION ALL
                      SELECT 'insertion', 'py_40_49', count(*),
                             sum(CASE WHEN min_py <= 49 AND max_py >= 40
                                 THEN 1 ELSE 0 END),
                             sum(CASE WHEN min_py <= 49 AND max_py >= 40
                                 THEN n_rows ELSE 0 END)
                      FROM it
                    ),
                    m AS (
                      SELECT 'px_10_19' AS predicate,
                             sum(CASE WHEN px BETWEEN 10 AND 19
                                 THEN 1 ELSE 0 END) AS rows_matching
                      FROM pts
                      UNION ALL
                      SELECT 'py_40_49',
                             sum(CASE WHEN py BETWEEN 40 AND 49
                                 THEN 1 ELSE 0 END)
                      FROM pts
                    )
                    SELECT a.layout, a.predicate,
                           CAST(a.n_tiles AS BIGINT) AS n_tiles,
                           CAST(a.tiles_scanned AS BIGINT) AS tiles_scanned,
                           CAST(a.rows_scanned AS BIGINT) AS rows_scanned,
                           CAST(m.rows_matching AS BIGINT) AS rows_matching
                    FROM audit a JOIN m USING (predicate)
                """,
        "zo1_zorder_tiles": f"""
                    WITH pts AS (
                      SELECT CAST(c_custkey % 89 AS BIGINT) AS px,
                             CAST(c_custkey % 97 AS BIGINT) AS py
                      FROM customer
                    ),
                    coded AS (
                      SELECT px, py, ({_MORTON7_SQL}) AS z FROM pts
                    )
                    SELECT CAST(z >> 6 AS BIGINT) AS tile,
                           CAST(count(*) AS BIGINT) AS n_rows,
                           CAST(min(px) AS BIGINT) AS min_px,
                           CAST(max(px) AS BIGINT) AS max_px,
                           CAST(min(py) AS BIGINT) AS min_py,
                           CAST(max(py) AS BIGINT) AS max_py
                    FROM coded GROUP BY 1
                """,
    }
