"""Query registry: one named query per operator in SURVEY.md §2 (plus
the beyond-parity datapipe operators), each with an ANSI-SQL oracle
the driver runs on DuckDB over the same parquet tables.

Every Spark implementation calls the engine's own operators
(``operators/``, ``enrich/``, ``datapipe/``, ``functions/``) — the
registry is the proof that each §2 capability exists and matches an
independent engine. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).

Cross-engine determinism rules used throughout (verified empirically):
- money aggregates: cast 2-decimal doubles to DECIMAL(18,2), sum
  exactly, cast the total to DOUBLE — bit-identical in both engines;
- ratios of ints and dot products (sequential double fold) are
  bit-identical; libm-heavy outputs (bearings) are bucketed, never
  emitted raw;
- hashes are md5-derived (``hash32``), never Spark-internal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    NUM_HASHES,
    embedding_near_dup_pairs,
    exact_duplicate_groups,
    hash32,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
    extract_byte_histograms,
    extract_features,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
    brute_force_neighbors,
    ivf_assignments,
    ivf_topk_neighbors,
)
from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    geocode_misses,
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.enrich.sides import (
    with_side_of_town,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import with_weather
from enriched_crime_incident_data_pipeline_spark.functions.geography import (
    side_of_town_col,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
    cross_snapshot_new_docs,
    ngram_contamination,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    bloom_build,
    bloom_probe,
    cms_counters,
    cms_estimates,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.tfidf import (
    tfidf_top_terms,
)
from enriched_crime_incident_data_pipeline_spark.functions.text import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    pii_counts,
    quality_features,
    repetition_features,
    scrub_pii,
    token_count,
    tokens,
    word_shingles,
)
from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
    dedup_by_key,
    idempotent_append,
)
from enriched_crime_incident_data_pipeline_spark.operators.derive import to_silver
from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
    propagate_emsstat_selfjoin,
)
from enriched_crime_incident_data_pipeline_spark.operators.health import (
    null_count_health,
)
from enriched_crime_incident_data_pipeline_spark.operators.ranks import (
    frequency_rank_table,
    with_frequency_rank,
)
from enriched_crime_incident_data_pipeline_spark.plans.events_adapter import (
    events_as_incidents_raw,
    synthetic_location_dim,
    synthetic_weather_hourly,
)
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table
from enriched_crime_incident_data_pipeline_spark.sources.urls import (
    classify_report_urls,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# shared DuckDB fragments for the events→incidents adapter
# (mirrors plans/events_adapter.py expression-for-expression)
# ---------------------------------------------------------------------------

_RAW = """
    SELECT strftime(ts, '%-m/%-d/%Y %-H:%M') AS datetime_str,
           CAST(event_id AS VARCHAR) AS incident_num,
           'BLK ' || CAST(user_id % 40 AS VARCHAR) || ' MAIN ST' AS location,
           upper(event_type) AS nature,
           CASE WHEN event_type = 'error' THEN 'EMSSTAT' ELSE 'OK0140200' END
             AS incident_ori
    FROM events
"""

_SILVER = f"""
    SELECT incident_num,
           strptime(datetime_str, '%-m/%-d/%Y %-H:%M') AS incident_ts,
           CAST(dayofweek(strptime(datetime_str, '%-m/%-d/%Y %-H:%M')) + 1
                AS INTEGER) AS day_of_week,
           CAST(hour(strptime(datetime_str, '%-m/%-d/%Y %-H:%M'))
                AS INTEGER) AS time_of_day,
           location, nature,
           CASE WHEN incident_ori = 'EMSSTAT' THEN 1 ELSE 0 END AS emsstat
    FROM ({_RAW})
"""

_DEDUPED = f"""
    SELECT * FROM ({_SILVER})
    QUALIFY row_number() OVER (PARTITION BY incident_num ORDER BY incident_num) = 1
"""

_LOCDIM = """
    SELECT 'BLK ' || CAST(m AS VARCHAR) || ' MAIN ST' AS loc,
           35.2226 + CAST(m - 20 AS DOUBLE) * 0.01 AS latitude,
           -97.4395 + CAST((m * 7) % 40 - 20 AS DOUBLE) * 0.0125 AS longitude
    FROM (SELECT DISTINCT user_id % 40 AS m FROM events)
"""

_SIDE_EXPR = """
    CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL THEN
      (['N','NE','E','SE','S','SW','W','NW'])[
        CAST(floor(
          (((degrees(atan2(
              cos(radians(latitude)) * sin(radians(longitude) - radians(-97.4395)),
              cos(radians(35.2226)) * sin(radians(latitude))
                - sin(radians(35.2226)) * cos(radians(latitude))
                  * cos(radians(longitude) - radians(-97.4395))
            )) + 360.0) % 360.0 + 22.5) % 360.0) / 45.0
        ) AS INTEGER) + 1]
    END
"""


def _silver_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedup_by_key(to_silver(events_as_incidents_raw(events)), "incident_num")


# ---------------------------------------------------------------------------
# flagship: the full reference pipeline, end-to-end (SURVEY §3.1)
# ---------------------------------------------------------------------------


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
        dedup_and_propagate,
    )
    from enriched_crime_incident_data_pipeline_spark.plans.pipeline import (
        enrich_after_emsstat,
    )
    from enriched_crime_incident_data_pipeline_spark.sinks.output import (
        gold_projection,
    )

    events = load_table(spark, sf_dir, "events")
    silver = to_silver(events_as_incidents_raw(events))
    # dedup + EMSSTAT fused onto one (ts, location) shuffle (duplicate
    # incident rows agree on ts/location); the result feeds both the
    # enrichment DAG and the weather work-list. EAGER localCheckpoint,
    # not lazy persist: the parse+shuffle lineage runs once as its own
    # job and is CUT from every consumer's plan (a lazy persist leaves
    # the full lineage in the first consumer's plan and only caches as
    # a side effect). The weather table is pinned for the same reason:
    # in deployment it IS a maintained table, and unpinned its
    # work-list aggregation re-runs inside the gold job. Measured
    # (sf0.1, median-of-3 end-to-end): 3.7 -> 2.5 s.
    # r5 session-2: base goes LAZY — Dataset.localCheckpoint truncates
    # the logical plan at call time either way (the 3.7→2.5 s note
    # above contrasted eager checkpoint vs lazy PERSIST, which doesn't
    # truncate); the weather cut below is base's first consumer and
    # scans every partition, so its (still eager) job materializes
    # base's blocks and the dedicated base job disappears. wh stays
    # EAGER: the gold job references base through two subtrees (its
    # own joins + wh's lineage), and sequencing the wh job first is
    # what guarantees base materializes exactly once.
    base = dedup_and_propagate(silver).localCheckpoint(eager=False)
    dim = synthetic_location_dim(events)
    wh = synthetic_weather_hourly(with_coordinates(base, dim)).localCheckpoint(
        eager=True
    )
    return gold_projection(enrich_after_emsstat(base, dim, wh))


_FLAGSHIP_SQL = f"""
WITH deduped AS ({_DEDUPED}),
ems AS (
  SELECT incident_num, incident_ts, day_of_week, time_of_day, location, nature,
         CAST(max(emsstat) OVER (PARTITION BY incident_ts, location) AS INTEGER)
           AS emsstat
  FROM deduped
),
locrank AS (
  SELECT location,
         CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS location_rank
  FROM deduped GROUP BY location
),
natrank AS (
  SELECT nature,
         CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS incident_rank
  FROM deduped GROUP BY nature
),
locdim AS ({_LOCDIM}),
coords AS (
  SELECT e.*, d.latitude, d.longitude
  FROM ems e LEFT JOIN locdim d ON e.location = d.loc
),
sided AS (
  SELECT *, {_SIDE_EXPR} AS side_of_town FROM coords
),
wh AS (
  SELECT DISTINCT latitude, longitude,
         CAST(incident_ts AS DATE) AS date, hour(incident_ts) AS hour,
         CAST((day(CAST(incident_ts AS DATE)) * 24 + hour(incident_ts)) % 100
              AS INTEGER) AS weather_code
  FROM coords WHERE latitude IS NOT NULL AND longitude IS NOT NULL
)
SELECT s.day_of_week, s.time_of_day, w.weather_code AS weather, s.location,
       lr.location_rank, s.side_of_town, nr.incident_rank, s.nature, s.emsstat
FROM sided s
LEFT JOIN locrank lr ON s.location = lr.location
LEFT JOIN natrank nr ON s.nature = nr.nature
LEFT JOIN wh w
  ON s.latitude = w.latitude AND s.longitude = w.longitude
 AND CAST(s.incident_ts AS DATE) = w.date AND hour(s.incident_ts) = w.hour
"""

# ---------------------------------------------------------------------------
# §2.2 projections / filters
# ---------------------------------------------------------------------------


def q_p1_projection(spark, sf_dir):
    # P1 output projection (main.py:22-25): column-subset select
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


def q_p2_star(spark, sf_dir):
    # P2 star projection (temp.py:14): SELECT * — the CSV-export scan
    return load_table(spark, sf_dir, "region")


def q_p3_point_lookup(spark, sf_dir):
    # P3 point-lookup filter (location.py:39)
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") == 500).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_p4_null_health(spark, sf_dir):
    # P4/A5 conditional NULL counts (main.py:108-112) in ONE pass
    li = load_table(spark, sf_dir, "lineitem")
    return null_count_health(li, ["l_quantity", "l_returnflag"])


def q_p6_url_classify(spark, sf_dir):
    # S1/S3/P6/F6/F11: regex-classify report hrefs built from order dates
    o = load_table(spark, sf_dir, "orders")
    hrefs = o.select(
        F.concat(
            F.lit("/sites/default/files/documents/"),
            F.date_format("o_orderdate", "yyyy-MM"),
            F.lit("/"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.when(F.col("o_orderkey") % 3 == 0, "_daily_incident_summary.pdf")
            .when(F.col("o_orderkey") % 3 == 1, "_daily_case_summary.pdf")
            .otherwise("_daily_arrest_summary.pdf"),
        ).alias("href")
    )
    out = classify_report_urls(hrefs)
    return out.filter(F.col("report_kind").isNotNull())


_P6_HREFS = """
    SELECT '/sites/default/files/documents/' || strftime(o_orderdate, '%Y-%m')
           || '/' || strftime(o_orderdate, '%Y-%m-%d')
           || CASE WHEN o_orderkey % 3 = 0 THEN '_daily_incident_summary.pdf'
                   WHEN o_orderkey % 3 = 1 THEN '_daily_case_summary.pdf'
                   ELSE '_daily_arrest_summary.pdf' END AS href
    FROM orders
"""

_P6_CLASSIFIED = f"""
    SELECT DISTINCT href,
      CASE
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_incident_summary\\.pdf')
          THEN 'incident'
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_case_summary\\.pdf')
          THEN 'case'
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_arrest_summary\\.pdf')
          THEN 'arrest'
      END AS report_kind,
      CASE WHEN regexp_extract(href, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0) <> ''
           THEN CAST(regexp_extract(href, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0) AS DATE)
      END AS report_date
    FROM ({_P6_HREFS})
"""


def q_s2_watermark_prune(spark, sf_dir):
    # S2/P5 strict-> watermark cutoff on the incident URL list
    import datetime as dt

    from enriched_crime_incident_data_pipeline_spark.sources.urls import (
        new_incident_urls,
    )

    o = load_table(spark, sf_dir, "orders")
    hrefs = o.select(
        F.concat(
            F.lit("/sites/default/files/documents/"),
            F.date_format("o_orderdate", "yyyy-MM"),
            F.lit("/"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
            F.when(F.col("o_orderkey") % 3 == 0, "_daily_incident_summary.pdf")
            .when(F.col("o_orderkey") % 3 == 1, "_daily_case_summary.pdf")
            .otherwise("_daily_arrest_summary.pdf"),
        ).alias("href")
    )
    return new_incident_urls(hrefs, dt.date(1997, 6, 30)).select(
        "href", "report_date"
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


def q_j1_broadcast_join(spark, sf_dir):
    # J1 inner equi-join, small dim broadcast (weather.py:34)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


def q_j2_emsstat_selfjoin(spark, sf_dir):
    # J2 literal self-join propagation; oracle uses the window-max
    # fixpoint (src/db/incidents.py:48-55 — semantically identical)
    silver = _silver_deduped(spark, sf_dir)
    return propagate_emsstat_selfjoin(silver).select("incident_num", "emsstat")


def q_j3_cache_antijoin(spark, sf_dir):
    # J3 geocode-cache miss list: distinct locations anti-join cache
    silver = _silver_deduped(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    cache = synthetic_location_dim(events).filter(
        F.col("latitude") < 35.2226  # pretend only southern half is cached
    )
    return geocode_misses(silver, cache)


def q_j5_weather_joinback(spark, sf_dir):
    # J5 weather write-back keyed on BOTH ts and location
    # (weather.py:61, TECHNICAL.md:171-177)
    events = load_table(spark, sf_dir, "events")
    silver = _silver_deduped(spark, sf_dir)
    dim = synthetic_location_dim(events)
    coords = with_coordinates(silver, dim)
    wh = synthetic_weather_hourly(coords)
    return with_weather(coords, wh).select("incident_num", "weather")


def q_j7_anti_join(spark, sf_dir):
    # J7 key anti-join (ON CONFLICT DO NOTHING core): customers with
    # no URGENT order — non-empty on this data
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey"
    )


def q_s6_idempotent_append(spark, sf_dir):
    # S6 idempotent batch insert: keys not already present
    o = load_table(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey")
    inserted = idempotent_append(o, existing, "o_orderkey")
    return inserted.select("o_orderkey")


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


def q_a1_groupby_count(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt"))


def q_a3_watermark_max(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.max(F.to_date("o_orderdate")).alias("watermark"))


def q_a4_global_count(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n"))


def q_a6_distinct_single(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderpriority").distinct()


def q_a7_distinct_multi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_nationkey", "o_orderpriority")
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------


def q_w1_frequency_rank(spark, sf_dir):
    # W1/W2 RANK over grouped counts, tie-gap semantics
    o = load_table(spark, sf_dir, "orders")
    return frequency_rank_table(o, "o_orderpriority", "freq_rank")


def q_j4_rank_joinback(spark, sf_dir):
    # J4 rank write-back join to every fact row
    li = load_table(spark, sf_dir, "lineitem")
    return with_frequency_rank(li, "l_returnflag", "flag_rank").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "flag_rank"
    )


def q_w3_window_max(spark, sf_dir):
    # W3 max-over-partition (EMSSTAT fixpoint shape) on events
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts"))
    flag = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return e.select(
        "event_id",
        F.max(flag).over(w).cast("int").alias("any_error_that_day"),
    )


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------


def q_f1_derivations(spark, sf_dir):
    # F1-F4 + F10: ts parse, day-of-week (1=Sunday), hour, EMS flag
    return _silver_deduped(spark, sf_dir).select(
        "incident_num", "incident_ts", "day_of_week", "time_of_day", "emsstat"
    )


def q_f5_date_format(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day")
    )


def q_f13_side_of_town(spark, sf_dir):
    # F13/F14/U3 bearing + compass bucket as pure column math over
    # pseudo-coordinates derived from customer keys
    c = load_table(spark, sf_dir, "customer")
    lat = F.lit(35.2226) + ((F.col("c_custkey") % 21) - 10).cast("double") * 0.013
    lon = F.lit(-97.4395) + ((F.col("c_custkey") % 17) - 8).cast("double") * 0.019
    return c.select(
        "c_custkey", side_of_town_col(lat, lon).alias("side_of_town")
    )


def q_f15_element_at(spark, sf_dir):
    # F15/P8 array index by hour with bounds guard
    emb = load_table(spark, sf_dir, "embeddings")
    idx = (F.col("vec_id") * 7 % 80).cast("int")
    return emb.select(
        "vec_id",
        F.when(idx < F.size("embedding"), F.element_at("embedding", idx + 1)).alias(
            "code"
        ),
    )


# ---------------------------------------------------------------------------
# engine capabilities beyond the reference's operator set (OLAP core)
# ---------------------------------------------------------------------------


def q_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
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


def q_sort_limit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


def q_pivot(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "error", "purchase", "signup"]
    out = (
        e.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


def q_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def q_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


def q_percentiles(spark, sf_dir):
    # exact linear-interpolation percentiles (global sort per group is
    # confined to each group's values; both engines interpolate on the
    # exact sorted doubles, so results are bit-equal)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )


def q_set_ops(spark, sf_dir):
    # EXCEPT / INTERSECT / UNION ALL over key sets
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    buyers = orders.select(F.col("o_custkey").alias("c_custkey"))
    without = building.subtract(buyers).withColumn(
        "status", F.lit("no_orders")
    )
    with_orders = building.intersect(buyers).withColumn(
        "status", F.lit("has_orders")
    )
    return without.unionByName(with_orders)


def q_set_ops_all(spark, sf_dir):
    # multiset set-algebra (bag semantics): EXCEPT ALL keeps surplus
    # multiplicities, INTERSECT ALL keeps min(multiplicity) — the
    # variant `set_ops`' distinct forms can't express.  Spark plans
    # both as counted aggregates + generate, never a row-pair join.
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderpriority")
    y97 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderpriority")
    surplus = y96.exceptAll(y97).withColumn("bag", F.lit("surplus_96"))
    common = y96.intersectAll(y97).withColumn("bag", F.lit("common"))
    return surplus.unionByName(common)


def q_j9_nullsafe_join(spark, sf_dir):
    # null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    # match each other — the equi-join family's missing member (a
    # plain ON k = k silently drops NULL groups).  Both sides are
    # aggregated FIRST so the NULL group is one row per side, never a
    # NULL×NULL cross blow-up; Spark still plans a hash join (the
    # null-safe condition is a join key wrapped in coalesce/knownnotnull).
    ev = load_table(spark, sf_dir, "events")
    bucket = F.when(
        F.col("value") >= 100, (F.col("user_id") % 10).cast("long")
    )  # value < 100 → NULL bucket
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(bucket.alias("bk"))
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(bucket.alias("bk"))
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    return clicks.join(
        views, clicks["bk"].eqNullSafe(views["bk"]), "inner"
    ).select(clicks["bk"].alias("bucket"), "n_clicks", "n_views")


def q_st3_stream_static_join(spark, sf_dir):
    # stream-static broadcast join: streaming events enriched against
    # a static dimension, then a streaming aggregation
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_events,
    )

    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 3), ("purchase", 4), ("signup", 5)],
        "event_type string, w int",
    )
    s = stream_events(spark, sf_dir).join(F.broadcast(dim), "event_type")
    agg = (
        s.groupBy("event_type", "w")
        .count()
        .select(
            "event_type",
            (F.col("count") * F.col("w")).cast("bigint").alias("weighted_n"),
        )
    )
    return run_available_now(
        agg, "st3_static_join", "complete", state_partitions=8
    )


def q_sessionization(spark, sf_dir):
    # gap > 30 min starts a new session; sessions per user
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    return (
        e.withColumn("_new", new_sess)
        .groupBy("user_id")
        .agg(F.sum("_new").cast("bigint").alias("n_sessions"))
    )


def q_window_tumbling(spark, sf_dir):
    # batch twin of the streaming 5-minute tumbling aggregation
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "5 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# datapipe: dedup / text analysis / similarity search
# ---------------------------------------------------------------------------


def q_dd1_exact_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicate_groups(docs)


def q_dd2_minhash_bands(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # internal band_hash is 16-byte binary (shuffle-lean); re-encode
    # as the md5 hex string at the output boundary for the oracle
    return minhash_bands(docs).withColumn(
        "band_hash", F.lower(F.hex(F.col("band_hash")))
    )


def q_dd3_lsh_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(minhash_bands(docs))


def q_dd4_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs)


def q_dd5_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, top_k=20)


def q_dd5b_ngram_capped(spark, sf_dir):
    # df-capped variant: shingles with document frequency > 50 are
    # pruned before the self-join — the 100 TB skew guard (a stop-word
    # shingle is one hot key with quadratic fan-out). Denominators
    # still count all shingles, but the intersection counts only
    # surviving shingles, so a surviving pair's jaccard is a lower
    # bound on the unpruned value (exact only when the pair shared no
    # pruned shingle).
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, top_k=20, max_df=50)


def q_dd19_lsh_verified(spark, sf_dir):
    # the canonical MinHash pipeline ENDING: banded LSH proposes
    # candidate pairs (recall set, never all-pairs), exact shingle
    # Jaccard verifies ONLY those — the shingle self-join is
    # restricted to docs appearing in some candidate pair (left-semi
    # prune), and the pair relation filters to the candidate list
    # (broadcast inner join), so the expensive exact intersection
    # touches candidates ∪ their docs, not the corpus².
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    cand = (
        lsh_candidate_pairs(minhash_bands(docs))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids = (
        cand.select(F.col("a").alias("doc_id"))
        .union(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    pruned = docs.join(ids, "doc_id", "left_semi")
    pairs = ngram_jaccard_pairs(pruned)
    return (
        pairs.join(F.broadcast(cand), ["a", "b"])
        .filter(F.col("jaccard") >= 0.5)
        .select("a", "b", "intersect_size", "union_size", "jaccard")
    )


def q_s5_pdf_parse(spark, sf_dir):
    # the reference's PDF text-block parse rules
    # (parse_incidents.py:40-56) run engine-side on a deterministic
    # text-blocks fixture — header/trailer drop, split +
    # remove-first-empty, pad/merge, positional 5-field extraction
    from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
        parse_report_blocks,
        synthetic_report_blocks,
    )

    docs = load_table(spark, sf_dir, "documents")
    return parse_report_blocks(synthetic_report_blocks(docs))


def q_s5b_pdf_decode(spark, sf_dir):
    # REAL-BYTES twin of s5: the same documents-derived report blocks
    # are written as an actual Flate-compressed PDF (pure-Python
    # writer), scanned back via binaryFile, decoded by the from-scratch
    # pure-Python PDF text extractor (sources/pdf_decode.py — closes
    # the U4 partial: no PyMuPDF anywhere), then parsed by the SAME
    # engine-side rules as s5. The oracle is s5's oracle verbatim — so
    # a driver-green row here proves the byte decode itself, not just
    # the parse rules. Fixture construction (collect + write) is
    # driver-side by design: it manufactures the input file.
    import os
    import shutil
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
        parse_report_blocks,
        pdf_binary_to_blocks,
        read_pdf_binary,
        synthetic_report_blocks,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.pdf_decode import (
        pdf_from_block_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = synthetic_report_blocks(docs).collect()
    base = tempfile.mkdtemp(prefix="spark_graft_s5b_")
    with open(os.path.join(base, "daily.pdf"), "wb") as fh:
        fh.write(
            pdf_from_block_rows(
                [
                    (r["page_number"], r["block_idx"], r["block_text"])
                    for r in rows
                ]
            )
        )
    parsed = parse_report_blocks(
        pdf_binary_to_blocks(read_pdf_binary(spark, base))
    ).select(
        F.lit("reports/daily.pdf").alias("path"),
        "page_number",
        "block_idx",
        "datetime_str",
        "incident_num",
        "location",
        "nature",
        "incident_ori",
    )
    out = parsed.localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


def q_ta11_lm_quality(spark, sf_dir):
    # unigram-LM quality score (perplexity proxy): corpus-trained
    # add-one-smoothed mean inverse token probability — rational
    # per-token terms + position-ordered fold keep it bit-exact
    # across engines (no transcendentals)
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        unigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_scores(docs)



def q_ta14_seed_lm_quality(spark, sf_dir):
    # CCNet-style quality scoring: LM trained on a curated SEED split
    # (doc_id % 10 < 2), every other doc scored by mean inverse token
    # probability under the seed model — unseen tokens take the
    # smoothed maximum term. Seed counts broadcast; no self-join.
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        seed_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return seed_lm_scores(
        docs.filter(F.col("doc_id") % 10 < 2),
        docs.filter(F.col("doc_id") % 10 >= 2),
    )


def q_ta12_bpe_tokens(spark, sf_dir):
    # GPT-2-style pretokenizer over RAW text: count + first/last
    # pretokens as the segmentation witness (whole array stays
    # non-scalar, so the compared face is scalar projections)
    from enriched_crime_incident_data_pipeline_spark.functions.text import (
        bpe_pretokens,
        bpe_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = bpe_pretokens(F.col("text"))
    return docs.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("n_pretokens"),
        F.get(toks, 0).alias("first_tok"),
        F.get(toks, F.size(toks) - 1).alias("last_tok"),
    )


def q_ta13_lang_confusion(spark, sf_dir):
    # lang-ID evaluation against the labeled lang column: the
    # (labeled, guessed) confusion matrix with per-cell counts and
    # the within-label share in basis points (exact integer math)
    docs = load_table(spark, sf_dir, "documents")
    guessed = docs.select(
        F.col("lang"), lang_id(F.col("text")).alias("lang_guess")
    )
    cells = guessed.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = guessed.groupBy("lang").agg(F.count(F.lit(1)).alias("_tot"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "lang_guess",
            "n",
            # integer DIV (not float-divide-then-cast: double→bigint
            # casts truncate in Spark but round in DuckDB)
            F.expr("CAST((n * 10000) DIV _tot AS BIGINT)").alias("share_bp"),
        )
    )


def q_ta1_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def q_ta2_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["digit_ratio"].alias("digit_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


def q_ta3_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess"))


def q_ta4_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


def q_ss1_ann_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_neighbors(emb, query_vec_id=0, k=10)


def q_ss2_ivf_assign(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_assignments(emb, n_centroids=8)


def q_ss3_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk_neighbors(emb, query_vec_id=0, k=10, n_centroids=8)



def q_ss13_filtered_ann(spark, sf_dir):
    # metadata-filtered vector search (r5): exact top-10 cosine
    # neighbors of vec 0 among label=4 vectors only. PRE-filter (rank
    # among matches), never post-filter (which under-returns); the
    # label predicate is a pushed parquet filter, the query vector
    # broadcasts, top-k is TakeOrdered — see datapipe/similarity.py.
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        filtered_topk_neighbors,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return filtered_topk_neighbors(emb, query_vec_id=0, label=4, k=10)


def q_ss14_mmr_topk(spark, sf_dir):
    # MMR-diversified retrieval (r5): greedy redundancy-penalized
    # top-5 of vec 0 (λ=0.7, μ=0.3) over an exact top-20 shortlist —
    # the standard RAG re-rank (plain top-k of a near-dup corpus
    # returns k copies of one doc). Corpus side = one broadcast-query
    # scan + TakeOrdered; the sequential greedy runs over the BOUNDED
    # shortlist with JVM-computed pairwise sims.
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        mmr_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(emb, query_vec_id=0, k=5, shortlist=20)


def q_ss12_truncated_recall(spark, sf_dir):
    # Matryoshka truncation eval: recall@10 of 16-of-64-dim search vs
    # full-dim exact — the measurement that licenses 4x cheaper
    # vector storage/IO; queries broadcast, corpus never shuffles
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        truncated_dim_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return truncated_dim_recall(emb, trunc_dim=16, query_mod=50, k=10)


def q_dc5_semantic_decontaminate(spark, sf_dir):
    # embedding-space decontamination: the paraphrase-robust
    # complement of dc1's n-gram probe — eval vectors broadcast,
    # train side scores map-only, threshold shared with dd6
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(emb, eval_mod=50, threshold=0.4)


def q_ss11_recall_eval(spark, sf_dir):
    # ANN index evaluation: recall@10 of the IVF read path vs exact
    # search over a sampled query set (vec_id % 50 == 0) — queries
    # broadcast, corpus never shuffles for scoring, per-query top-k
    # windows parallel across queries; recall is an exact int ratio
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        ann_recall_eval,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_recall_eval(emb, query_mod=50, k=10, n_centroids=8)


def q_dd6_embed_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4)


def q_dd7_embed_blocked(spark, sf_dir):
    # IVF-blocked variant: intra-cluster pairs only (the 100 TB path)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.3, block_clusters=16)



def q_dd14_semdedup(spark, sf_dir):
    # SemDeDup (Abbas et al. 2023): IVF-cluster the embedding space,
    # take intra-cluster pairs with cosine >= 0.3 (the dd7 blocked
    # pair generator — never a full-corpus product), connected-
    # components the pair graph, keep the lowest-id representative
    # per semantic-duplicate group, and emit the drop list
    # (vec_id, rep_id) a corpus prune deletes.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        dup_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.3, block_clusters=16)
    cl = dup_clusters(
        emb.select(F.col("vec_id").alias("doc_id")),
        pairs.select("a", "b"),
        id_col="doc_id",
    )
    return cl.filter(~F.col("is_canonical")).select(
        F.col("doc_id").alias("vec_id"),
        F.col("cluster_id").alias("rep_id"),
    )


def _documents_as_media(docs: DataFrame) -> DataFrame:
    # opaque-binary media table derived deterministically from the
    # documents fixture: payload = UTF-8 bytes of the text
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/png").alias("mime"),
    )


def q_mm1_media_features(spark, sf_dir):
    # Arrow-batched mapInPandas feature extraction over binary media.
    # The driver-compared face is the exact integer byte-histogram
    # projected to a JSON string (canonicalizable scalar; bit-equal
    # SQL twin); the normalized float feature from extract_features is
    # unit-pinned in tests/test_multimodal_streaming.py
    docs = load_table(spark, sf_dir, "documents")
    hist = extract_byte_histograms(_documents_as_media(docs))
    return hist.select(
        "media_id",
        "kind",
        "n_bytes",
        F.to_json("hist").alias("feature_json"),
    )


def q_mm4_resize_plan(spark, sf_dir):
    # thumbnail-fit dimensions through the Arrow mapInPandas path —
    # integer math gives the UDF stage an exact SQL twin
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        resize_thumbnails,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs).select(
        "media_id",
        "kind",
        "content",
        (320 + (F.col("media_id") % 7) * 160).cast("int").alias("width"),
        (240 + (F.col("media_id") % 5) * 120).cast("int").alias("height"),
    )
    return resize_thumbnails(media, max_side=224)


def q_mm5_phash_neardup(spark, sf_dir):
    # perceptual (dHash) image near-dup pairs over binary media:
    # Arrow-kernel signatures, 4x16-bit pigeonhole band candidate
    # join (complete for Hamming<=3), exact bit_count(xor) verify —
    # the image-side twin of dd8's text SimHash dedup
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return phash_near_dup_pairs(_documents_as_media(docs), max_hamming=3)


def q_a10_count_distinct(spark, sf_dir):
    # distinct-aggregate: planned as a two-phase expand + aggregate
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_dd8_simhash_pairs(spark, sf_dir):
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        simhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, max_hamming=3)


def q_ta6_winnow(spark, sf_dir):
    from enriched_crime_incident_data_pipeline_spark.functions.text import (
        winnow_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", winnow_fingerprint(F.col("text")).alias("winnow")
    )


def q_mm3_frame_sample(spark, sf_dir):
    # frame-sampling fan-out over video metadata (decode stays a stub;
    # the offset explosion is pure relational work)
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        sample_frame_offsets,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
    return sample_frame_offsets(media, step_ms=1000)


def q_json_extract(spark, sf_dir):
    # JSON path extraction from the events props column
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count("_k").alias("n_k"),
            F.sum("_k").cast("bigint").alias("sum_k"),
            F.max("_k").alias("max_k"),
        )
    )


def q_tp1_pack(spark, sf_dir):
    # concat-and-chunk sequence packing via two-phase prefix sum —
    # the only corpus-wide windows run per value-derived bucket, plus
    # one window over the (tiny) bucket-totals relation
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        pack_assignments,
    )

    docs = load_table(spark, sf_dir, "documents")
    return pack_assignments(docs)


def q_tp2_stratified_sample(spark, sf_dir):
    # deterministic hash-based stratified sampling (reproducible
    # across engines/runs — no RNG state)
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, rates_bp={"src0": 10000, "src1": 5000, "src2": 0}, default_bp=2500
    ).select("doc_id", "source")


def q_tp3_boilerplate_prune(spark, sf_dir):
    # document-frequency boilerplate removal + order-preserving
    # reassembly (integer-math threshold: df·100 ≥ pct·n_docs)
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        prune_boilerplate,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prune_boilerplate(docs, df_pct_threshold=79)


def q_tp4_shuffle_shards(spark, sf_dir):
    # deterministic global training-order shuffle into shards
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        shuffle_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, n_shards=8)


def q_asof_join(spark, sf_dir):
    # point-in-time join: each purchase picks the latest at-or-before
    # view of the same user — union-tag + running last(), ONE shuffle
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(purchases, views, ["user_id"], "ts", "event_id")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("view_event_id"),
        F.col("asof_value").alias("view_value"),
    )



def q_asof2_forward(spark, sf_dir):
    # forward as-of: each purchase picks the EARLIEST at-or-after
    # view of the same user (the "next observation" join — lead-time
    # features, next-touch attribution). Same union-tag single
    # shuffle; the frame flips to [current, ∞) with right rows
    # sorted after left at equal ts.
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, views, ["user_id"], "ts", "event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("view_event_id"),
        F.col("asof_value").alias("view_value"),
    )


def q_asof3_nearest(spark, sf_dir):
    # nearest as-of (pandas merge_asof direction='nearest'):
    # whichever same-user view is closer in time, equidistant
    # resolving backward. Still ONE key shuffle — the union carries
    # right rows once per scan direction and both windows share the
    # partitioning.
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, views, ["user_id"], "ts", "event_id",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("view_event_id"),
        F.col("asof_value").alias("view_value"),
    )


def q_asof4_tolerance(spark, sf_dir):
    # bounded-staleness as-of (merge_asof tolerance): the matched
    # view nulls out if it is staler than 30 minutes — a residual
    # null-out predicate after the match resolves, so the plan is
    # byte-identical to asof_join's single-shuffle shape.
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, views, ["user_id"], "ts", "event_id",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("view_event_id"),
        F.col("asof_value").alias("view_value"),
    )


def q_sk4_hll_distinct(spark, sf_dir):
    # deterministic HyperLogLog: 1024 registers over a 52-bit
    # md5-derived hash, rho via integer bit-length (no log2), raw
    # estimator only (range corrections need ln, a transcendental
    # that breaks cross-engine bit-parity). The register table is the
    # mergeable 1 KiB sketch state.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_distinct_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return hll_distinct_estimate(li, F.col("l_partkey").cast("string"))


def q_sk5_hll_rollup(spark, sf_dir):
    # mergeable-sketch rollup: distinct active customers per nation /
    # region / global as HLL register tables. The leaf (nation) level
    # is the ONLY pass over the fact data; region and global sketches
    # are derived by MERGING register tables (max per register) — the
    # associativity the oracle verifies by computing each level
    # directly from the raw rows. This is the 100 TB count-distinct
    # rollup shape: 1 KiB of state per group, no re-scan per level.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_estimates_from_registers,
        hll_grouped_registers,
        hll_merge_registers,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rel = (
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name", "r_name", F.col("o_custkey").cast("string").alias("cust"))
    )
    nat_regs = hll_grouped_registers(rel, ["n_name", "r_name"], F.col("cust"))
    reg_regs = hll_merge_registers(nat_regs, ["r_name"])
    glob_regs = hll_merge_registers(reg_regs, [])
    est = lambda regs, cols, level, key: (  # noqa: E731
        hll_estimates_from_registers(regs, cols).select(
            F.lit(level).alias("level"),
            key.alias("key"),
            "m",
            "observed",
            "raw_estimate",
        )
    )
    return (
        est(nat_regs, ["n_name", "r_name"], "nation", F.col("n_name"))
        .unionByName(est(reg_regs, ["r_name"], "region", F.col("r_name")))
        .unionByName(est(glob_regs, [], "global", F.lit("ALL")))
    )


def q_sk6_kmv_set_ops(spark, sf_dir):
    # sketch set algebra: union/intersection/Jaccard of the part sets
    # shipped before vs from 1997, from two 256-hash KMV sketches —
    # no re-scan, no join of the underlying sets; the k-min merge is
    # TakeOrdered, estimator arithmetic integer-exact + one divide
    # chain (bit-reproducible)
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        kmv_set_estimates,
    )

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_shipdate") < "1997-01-01")
    b = li.filter(F.col("l_shipdate") >= "1997-01-01")
    return kmv_set_estimates(
        a,
        b,
        F.col("l_partkey").cast("string"),
        F.col("l_partkey").cast("string"),
    )


def q_sk7_quantile_sketch(spark, sf_dir):
    # mergeable histogram quantile sketch: p50/p95/p99 of
    # l_extendedprice from a fixed-width bucket→count table. One
    # groupBy pass over the fact data (map-side combine bounds the
    # shuffle at ~#buckets rows per partition); the read-out window
    # runs over the tiny bucket relation only. |est − true| < width
    # by construction (pinned in test_graph_sketch.py).
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        histogram_quantile_sketch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantile_sketch(
        li, F.col("l_extendedprice"), 1000.0,
        qs=((1, 2), (19, 20), (99, 100)),
    )


def q_st15_stream_temporal_enrich(spark, sf_dir):
    # stream-static temporal (SCD2 as-of) enrichment: arriving fact
    # events join the static dimension-history table on key +
    # interval containment — STATELESS on the stream side (each
    # micro-batch joins the static relation; no watermark state),
    # the streaming twin of scd3. AvailableNow run ≡ the batch
    # lookup, same oracle SQL.
    from enriched_crime_incident_data_pipeline_spark.operators.scd import (
        scd2_intervals,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    ev = load_table(spark, sf_dir, "events")
    # the dimension HISTORY is a maintained table in any real
    # deployment, not something rebuilt per arriving batch — pin it
    # once before the stream starts, so each micro-batch joins the
    # materialized intervals instead of re-running the version window
    dim = scd2_intervals(
        ev.filter(F.col("event_type").isin("signup", "purchase")).select(
            F.col("event_id").alias("dim_event_id"),
            "user_id",
            "ts",
            F.col("value").alias("dim_value"),
        ),
        ["user_id"],
        "ts",
        "dim_event_id",
    ).localCheckpoint(eager=True)
    # normalize the raw stream's TIMESTAMP_NTZ once in the projection
    # (one cast per fact row). Left inside the join residual, Spark
    # wraps EVERY candidate comparison in the zone cast — the SMJ
    # evaluates the residual per (fact, version) pair, so the cast
    # runs ~versions-per-key times per fact: measured 18 s vs 3 s on
    # the 10M-event backfill
    facts = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
    )
    joined = facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (dim["valid_from"] <= facts["ts"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
        "left",
    ).select(
        facts["event_id"], facts["user_id"], facts["ts"],
        "dim_event_id", "dim_value",
    )
    # NO state_partitions override: this query is STATELESS (no
    # aggregation/dedup/stream-stream join → zero state stores), so
    # shuffle partitioning should track DATA volume like any batch
    # join — pinning it to a small state-sized count strangled the
    # join at the 10M-event backfill point (62 s → 28 s at sf10;
    # with the projection-cast fix above, 7.2 s vs the 3.5 s batch
    # twin — the residue is micro-batch machinery + sink collection)
    return run_available_now(joined, "st15_temporal_enrich", "append")


def q_sk1_kmv_distinct(spark, sf_dir):
    # deterministic KMV distinct sketch: k smallest md5 hashes →
    # estimate, reproducible bit-for-bit in any engine with md5
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        kmv_distinct_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct_estimate(li, F.col("l_partkey").cast("string"))


def q_scd2_intervals(spark, sf_dir):
    # SCD2 dimension build: each (user, signup/purchase) event opens a
    # validity interval, closed by the key's next event
    from enriched_crime_incident_data_pipeline_spark.operators.scd import (
        scd2_intervals,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    out = scd2_intervals(
        ev.select("event_id", "user_id", "ts", "value"),
        ["user_id"],
        "ts",
        "event_id",
    )
    return out.select(
        "event_id", "user_id", "value", "valid_from", "valid_to", "is_current"
    )


def q_range_join(spark, sf_dir):
    # interval join with NO equi-key: customers whose balance falls in
    # a part's price band — bucket-equi-join + residual, not a
    # nested-loop cartesian
    from enriched_crime_incident_data_pipeline_spark.operators.rangejoin import (
        bucketed_range_join,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    out = bucketed_range_join(
        part,
        cust,
        lo=F.col("p_retailprice"),
        hi=F.col("p_retailprice") + F.col("p_size") / 100.0,
        value=F.col("c_acctbal"),
        bucket_width=1.0,
    )
    return out.select("c_custkey", "p_partkey", "c_acctbal", "p_retailprice")



def q_j11_interval_overlap(spark, sf_dir):
    # interval-overlap join (interval x interval): 2h maintenance
    # windows vs 30min activity windows — bucket-exploded equi-join
    # with start-bucket attribution (each pair found exactly once, no
    # dedup shuffle), never a nested loop
    from enriched_crime_incident_data_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", F.unix_timestamp("ts").cast("bigint").alias("_lo")
    )
    windows = base.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("win_id"),
        F.col("_lo").alias("w_lo"),
        (F.col("_lo") + 7200).alias("w_hi"),
    )
    activity = base.select(
        F.col("event_id").alias("act_id"),
        F.col("_lo").alias("a_lo"),
        (F.col("_lo") + 1800).alias("a_hi"),
    )
    out = interval_overlap_join(
        windows, activity, "win_id", "w_lo", "w_hi",
        "act_id", "a_lo", "a_hi", bucket_width=3600,
    )
    return out.filter(F.col("win_id") != F.col("act_id"))



def q_dd15_containment(spark, sf_dir):
    # asymmetric near-dup: shingle containment |A∩B|/|A| — catches a
    # short doc quoted inside a long one (containment 1.0, Jaccard
    # tiny); same single shingle-hash equi-join plan as dd5
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        ngram_containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ngram_containment_pairs(docs, min_containment=0.5)



def q_dd16_minhash_estimate(spark, sf_dir):
    # the LSH report card: for every candidate pair, the MinHash
    # Jaccard ESTIMATE (fraction of agreeing minima — exact int
    # ratio) next to the true shingle Jaccard. Signatures map-only;
    # the only joins are the band bucket join and two broadcast
    # signature lookups.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        minhash_sigs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    sigs = minhash_sigs(docs)
    sa = sigs.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(16)],
    )
    n_match = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(16)
    )
    est = pairs.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b").select(
        "a", "b",
        n_match.alias("n_match"),
        (n_match.cast("double") / F.lit(16.0)).alias("est_jaccard"),
    )
    true_j = ngram_jaccard_pairs(docs).select("a", "b", "jaccard")
    return est.join(true_j, ["a", "b"], "left").select(
        "a", "b", "n_match", "est_jaccard",
        F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
    )


def q_dd9_dup_clusters(spark, sf_dir):
    # the dedup endgame: LSH candidate pairs → connected components →
    # one canonical doc per cluster (iterative min-label propagation)
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    return dup_clusters(docs, pairs)


def q_dd10_dedup_keeper(spark, sf_dir):
    # corpus-clean drop-list: LSH pairs → connected components →
    # keep-longest keeper per cluster, emit the rows to delete
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
        dedup_drop_list,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    members = connected_components(pairs).withColumnRenamed("node", "node")
    sizes = docs.select(
        F.col("doc_id").alias("node"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return dedup_drop_list(members, sizes)


def q_ss6_quantize_int8(spark, sf_dir):
    # int8 scalar quantization of the embedding column (4× storage
    # cut before ANN indexing) through the Arrow numpy kernel; q array
    # projected to JSON for the driver compare, reconstruction error
    # as the quality audit
    from enriched_crime_incident_data_pipeline_spark.functions.vectors import (
        quantize_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb)


def q_dd11_segment_dedup(spark, sf_dir):
    # corpus-wide exact segment dedup (C4-style line dedup at
    # 10-token granularity): later occurrences of any segment drop,
    # docs rebuilt from survivors in order
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        segment_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup(docs, seg_tokens=10)


def q_corpus_refresh1(spark, sf_dir):
    # INCREMENTAL corpus refresh (r5 capstone): the verdict a daily
    # snapshot ingest issues for every ARRIVING doc (old corpus =
    # doc_id < 250, arriving batch = rest), with cost ∝ the
    # increment, never the standing corpus:
    #   1. exact cross-snapshot dedup — fingerprint probe against the
    #      standing fingerprint table (dc2's mechanism);
    #   2. near-dup vs the STANDING band index — incremental LSH
    #      (dd12's mechanism: index append-only, batch bands probe
    #      it, |new|×hit-rate work, corpus never self-joins);
    #      new-vs-new pairs use the one-shot pairwise keep-lowest-id
    #      policy (the cluster-level keeper variant is dd9/dd10);
    #   3. 8-gram decontamination — broadcast eval grams, in-row
    #      kernel flag (dc6's mechanism).
    # Verdict precedence: exact_dup > near_dup_old > near_dup_new >
    # contaminated > kept. Output: one row per arriving doc.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        incremental_lsh_pairs,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        with_contamination_flag,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "text", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    new = fp.filter(F.col("doc_id") >= 250)
    old_fps = (
        fp.filter(F.col("doc_id") < 250).select("fingerprint").distinct()
    )
    exact_ids = (
        new.join(old_fps, "fingerprint", "left_semi")
        .select("doc_id")
        .withColumn("_e", F.lit(1))
    )
    bands = minhash_bands(docs)
    pairs = incremental_lsh_pairs(
        bands.filter(F.col("doc_id") >= 250),
        bands.filter(F.col("doc_id") < 250),
    )
    # pairs are (least, greatest); old ids < 250 <= new ids, so a
    # cross pair always has the old doc on the a side
    near_old = (
        pairs.filter((F.col("a") < 250) & (F.col("b") >= 250))
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("_no", F.lit(1))
    )
    near_new = (
        pairs.filter(F.col("a") >= 250)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("_nn", F.lit(1))
    )
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    contam = (
        with_contamination_flag(new.select("doc_id", "text"), eval_docs, n=8)
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
        .withColumn("_c", F.lit(1))
    )
    return (
        new.select("doc_id")
        .join(exact_ids, "doc_id", "left")
        .join(near_old, "doc_id", "left")
        .join(near_new, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_e") == 1, F.lit("exact_dup"))
            .when(F.col("_no") == 1, F.lit("near_dup_old"))
            .when(F.col("_nn") == 1, F.lit("near_dup_new"))
            .when(F.col("_c") == 1, F.lit("contaminated"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


def q_dd18_intradoc_dedup(spark, sf_dir):
    # WITHIN-doc segment dedup (C4's boilerplate strip): first
    # occurrence of each 10-token segment inside its own document —
    # no corpus-wide state at all, one Arrow map hop, runs BEFORE the
    # corpus passes so their shuffles see already-shrunk text.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        intradoc_segment_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return intradoc_segment_dedup(docs, seg_tokens=10)


def q_dd17_cdc_segments(spark, sf_dir):
    # content-defined segment dedup (r5): boundaries fall where the
    # rolling 8-token window hash ≡ 0 mod 16 (FastCDC/LBFS applied at
    # token granularity), so an edit near a doc's head re-synchronizes
    # within ~8 tokens and the shared tail still dedups — the
    # shift-robust companion to dd11's fixed windows. Segment text
    # never shuffles (hash-only keeper, min-struct agg, re-slice
    # rebuild).
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        cdc_segment_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return cdc_segment_dedup(docs, window=8, divisor=16)


def q_dd12_incremental_lsh(spark, sf_dir):
    # incremental index maintenance: new docs (doc_id % 5 == 0) probe
    # the standing band index — work ∝ |new| × bucket hit rate, never
    # |corpus|²; output = full-corpus pairs restricted to new docs
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        incremental_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    old_docs = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_lsh_pairs(
        minhash_bands(new_docs), minhash_bands(old_docs)
    )


def q_dd13_repeated_spans(spark, sf_dir):
    # exact-substring dedup stats (Lee et al. 2022 move): stride-1
    # 10-token windows → corpus-wide occurrence count (one uniform
    # md5-key shuffle) → per-doc gaps-and-islands merge into maximal
    # duplicated spans; no self-join anywhere
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        repeated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans(docs, win_tokens=10, min_count=2)


def q_dd13b_repeated_spans_sampled(spark, sf_dir):
    # winnowed variant of dd13 (round-4 scale item): only each
    # 8-window argmin enters the corpus-wide count shuffle (~22% of
    # the rows), deterministic coverage — every duplicated region
    # >= 31 tokens is detected; argmin carries hash||offset in one
    # 61-bit key so selection needs no join-back
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        repeated_spans_sampled,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans_sampled(docs, win_tokens=10, winnow_w=8)


def q_st6_stream_lsh_probe(spark, sf_dir):
    # continuous dedup: a document stream computes row-wise MinHash
    # bands (stateless map — possible only because signatures no
    # longer groupBy) and probes the STATIC band index via a
    # stream-static equi-join; dropDuplicates dedups multi-band hits.
    # Bounded AvailableNow run ≡ the batch incremental probe.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    index = minhash_bands(docs.filter(F.col("doc_id") % 5 != 0)).select(
        F.col("doc_id").alias("b"), "band_id", "band_hash"
    )
    new_stream = stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    probes = minhash_bands(new_stream).select(
        F.col("doc_id").alias("a"), "band_id", "band_hash"
    )
    hits = (
        probes.join(index, ["band_id", "band_hash"])
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    return run_available_now(
        hits, "st6_lsh_probe", "append", state_partitions=8
    )


def q_st17_stream_bloom_probe(spark, sf_dir):
    # continuous decontamination at ingest (r5): arriving docs probe
    # the STATIC packed-bitset Bloom of the eval grams — the whole
    # probe is a stateless map (broadcast 1-row bitset crossJoin +
    # column exprs, see dc7), so it is legal on a stream unchanged
    # and batch ≡ stream bit-for-bit; the oracle is dc7's SQL
    # restricted to the streamed split.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        bloom_decontaminate,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    stream_train = (
        stream_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", "text")
    )
    out = bloom_decontaminate(stream_train, eval_docs, n=8)
    return run_available_now(out, "st17_bloom_probe", "append")


def q_st14_stream_phash_probe(spark, sf_dir):
    # continuous IMAGE dedup at ingest: arriving media compute their
    # dHash row-wise (the Arrow kernel is a stateless map, legal on a
    # stream) and probe the STATIC signature band index via a
    # stream-static equi-join; multi-band hits dedup, then the exact
    # bit_count(xor) Hamming verify runs on candidates only — the
    # multimodal twin of st6's text LSH probe.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        simhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        dhash_signatures,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    static_sig = dhash_signatures(
        _documents_as_media(docs.filter(F.col("doc_id") % 5 != 0))
    ).withColumnRenamed("dhash", "simhash")
    index = simhash_bands(static_sig, "media_id").select(
        F.col("media_id").alias("_ib"),
        "band_idx",
        "band_val",
        F.col("simhash").alias("_sb"),
    )
    stream_media = (
        stream_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("content"),
        )
    )
    probe_sig = dhash_signatures(stream_media).withColumnRenamed(
        "dhash", "simhash"
    )
    probes = simhash_bands(probe_sig, "media_id").select(
        F.col("media_id").alias("_ia"),
        "band_idx",
        "band_val",
        F.col("simhash").alias("_sa"),
    )
    hits = (
        probes.join(index, ["band_idx", "band_val"])
        .select(
            F.least("_ia", "_ib").alias("a"),
            F.greatest("_ia", "_ib").alias("b"),
            F.col("_sa"),
            F.col("_sb"),
        )
        .dropDuplicates(["a", "b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= 3)
        .select("a", "b", "hamming")
    )
    return run_available_now(
        hits, "st14_phash_probe", "append", state_partitions=8
    )


def q_corpus_report1(spark, sf_dir):
    # the DATASET CARD: one small (section, key, value) report a
    # curation pipeline publishes with a corpus — size/token totals,
    # language and source composition, near-dup exposure, eval
    # contamination. Every section is a tiny aggregate over operators
    # the engine already runs at scale; the report relation itself is
    # dozens of rows, so the unions are free.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        _pin,
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("nt"),
        lang_id(F.col("text")).alias("lang"),
    )
    c = toks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("nt").alias("t")
    )
    corpus_rows = c.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("n_docs").alias("key"),
                    F.col("n").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("total_tokens").alias("key"),
                    F.col("t").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("corpus").alias("section"),
                    F.lit("mean_doc_tokens").alias("key"),
                    (F.col("t").cast("double") / F.col("n").cast("double")).alias(
                        "value"
                    ),
                ),
            )
        ).alias("r")
    ).select("r.*")
    lang_rows = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).select(
        F.lit("lang").alias("section"),
        F.col("lang").alias("key"),
        F.col("c").cast("double").alias("value"),
    )
    source_rows = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("c")
    ).select(
        F.lit("source").alias("section"),
        F.col("source").alias("key"),
        F.col("c").cast("double").alias("value"),
    )
    pairs = _pin(lsh_candidate_pairs(minhash_bands(docs)))
    dup_pair_rows = pairs.agg(F.count(F.lit(1)).alias("c")).select(
        F.lit("dedup").alias("section"),
        F.lit("near_dup_pairs").alias("key"),
        F.col("c").cast("double").alias("value"),
    )
    dup_doc_rows = (
        pairs.select(F.col("a").alias("d"))
        .unionAll(pairs.select(F.col("b").alias("d")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.lit("dedup").alias("section"),
            F.lit("docs_in_dup_pairs").alias("key"),
            F.col("c").cast("double").alias("value"),
        )
    )
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    contam_rows = (
        ngram_contamination(train, eval_docs, n=8)
        .agg(F.sum("contaminated").alias("c"))
        .select(
            F.lit("decontamination").alias("section"),
            F.lit("contaminated_docs").alias("key"),
            F.col("c").cast("double").alias("value"),
        )
    )
    return (
        corpus_rows.unionByName(lang_rows)
        .unionByName(source_rows)
        .unionByName(dup_pair_rows)
        .unionByName(dup_doc_rows)
        .unionByName(contam_rows)
    )


def q_gr1_pagerank(spark, sf_dir):
    # link-authority weighting for corpus curation (Common Crawl
    # publishes per-host centrality; crawl schedulers prioritize by
    # it): damped PageRank, 5 rounds, over the near-dup "citation"
    # graph — each LSH pair is an edge from the newer doc to the
    # older one it duplicates. Reproducible ordered-fold mode so the
    # doubles are bit-exact vs the oracle's unrolled iteration; the
    # production default is the map-side-combinable unordered sum
    # (see datapipe/pagerank.py docstring).
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    edges = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    pr = pagerank(edges, nodes, iters=5, ordered=True)
    return pr.select(F.col("id").alias("doc_id"), F.col("rank").alias("pr"))


def q_gr2_pagerank_converged(spark, sf_dir):
    # PageRank with the r5 convergence early exit doing real work:
    # the link graph is a DAG (every doc points to doc_id DIV 16 —
    # a 16-ary ancestry tree), where rank mass only flows downward,
    # so the iterate reaches a BIT-EXACT fixpoint after depth+1
    # rounds and tol=0.0 stops there (~round 5-6 of the 8 budgeted;
    # the oracle's 8 unrolled rounds give the identical fixpoint, so
    # exactness is preserved by construction). Cyclic graphs (gr1)
    # converge only geometrically and run their full budget.
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.filter(F.col("doc_id") >= 1).select(
        F.col("doc_id").alias("src"),
        F.expr("doc_id DIV 16").alias("dst"),
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    pr = pagerank(edges, nodes, iters=8, ordered=True, tol=0.0)
    return pr.select(F.col("id").alias("doc_id"), F.col("rank").alias("pr"))


def q_gr3_hits(spark, sf_dir):
    # HITS hub/authority over the near-dup citation graph (gr1's
    # edges: newer doc → older doc it duplicates). Integer power
    # iteration — no per-round normalization, so every score is an
    # exact BIGINT and the production unordered map-side-combinable
    # sum IS the bit-exact cross-engine aggregation (associativity;
    # see datapipe/hits.py for the overflow bound).
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.hits import (
        hits_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    edges = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    out = hits_scores(edges, nodes, iters=4)
    return out.select(F.col("id").alias("doc_id"), "authority", "hub")


def q_tok1_bpe_merges(spark, sf_dir):
    # tokenizer training: learn the first 3 BPE merge rules from the
    # corpus. Each round is one corpus-wide adjacent-pair groupBy
    # (map-side combinable) + a broadcast 1-row winner applied via
    # the ordered greedy-merge fold; see datapipe/bpe.py.
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        learn_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(docs, iters=3)


def q_tok2_bpe_encode(spark, sf_dir):
    # tokenizer read path: encode the corpus with the 3 learned
    # merges; per-doc sequence length before/after — the compression
    # audit published with a tokenizer-training run.
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        bpe_encode_lengths,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_lengths(docs, iters=3)


def q_tok3_wordpiece_encode(spark, sf_dir):
    # WordPiece-style read path: induce a vocab (all corpus chars +
    # top-40 length-2/3 substrings, deterministic tiebreak), then
    # greedy longest-match encode every word as a map-only sequential
    # fold. The fp column pins the EXACT segmentation cross-engine.
    from enriched_crime_incident_data_pipeline_spark.datapipe.wordpiece import (
        wordpiece_encode,
    )

    docs = load_table(spark, sf_dir, "documents")
    return wordpiece_encode(docs, top_k=40)


def q_tok4_bpe_sampled(spark, sf_dir):
    # production BPE training shape: learn the merge table on a
    # deterministic md5-hash HALF of the corpus (training cost scales
    # with the sample), then encode the FULL corpus once per rule
    # with the learned table — map-only, no counting shuffle over the
    # full data. Resolves the merges×passes cost note (PLANS.md).
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        bpe_encode_sampled,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_sampled(docs, iters=3, sample_bp=5000)


def q_tok5_bpe_char_merges(spark, sf_dir):
    # classic character-level BPE (word-bounded, GPT-2/SentencePiece
    # shape), trained on the WORD HISTOGRAM: the corpus shuffles once
    # into (word, freq); every round's pair count is a frequency-
    # weighted aggregation over distinct words only — the exact-train
    # answer to merges×passes (a 50k-merge vocab is 50k rounds over a
    # Zipf-small relation, not 50k corpus passes).
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        learn_bpe_merges_chars,
    )

    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges_chars(docs, iters=3)


def q_tok6_bpe_char_encode(spark, sf_dir):
    # character-BPE read path: per-document token budget under the
    # learned vocab WITHOUT re-walking any document text — each
    # distinct word's piece count is known from the trained word-
    # symbol relation, so the corpus side is explode + equi-join +
    # groupBy (text never enters the tokenizer twice).
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        bpe_encode_chars,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_chars(docs, iters=3)


def q_tok7_fertility_audit(spark, sf_dir):
    # the standard tokenizer-eval report: FERTILITY (pieces per word)
    # by source domain under the char-BPE vocab — the number that
    # decides whether a tokenizer under-serves a domain (high
    # fertility = more compute per word). Integer-exact: fertility in
    # basis points via integer DIV, no float ratio to drift.
    from enriched_crime_incident_data_pipeline_spark.datapipe.bpe import (
        bpe_encode_chars,
    )

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_chars(docs, iters=3)
    per_doc = enc.join(docs.select("doc_id", "source"), "doc_id")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe").alias("n_pieces"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_pieces",
            F.expr("CAST((n_pieces * 10000) DIV n_words AS BIGINT)").alias(
                "fertility_bp"
            ),
        )
    )


def q_corpus_build2(spark, sf_dir):
    # the round-2 corpus build, composed end-to-end from the new
    # operators: LM-quality filter (corpus-trained perplexity proxy)
    # → doc-level near-dup removal via the keeper drop-list →
    # corpus-wide segment dedup. One declared DAG.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
        dedup_drop_list,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        segment_dedup,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        with_unigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r5: in-row quality score — filter without the ids join-back;
    # stage boundary after the filter (fdocs feeds the band index,
    # the size table, and the anti-join — 3 consumers, one cut)
    fdocs = (
        with_unigram_lm_scores(docs)
        .filter((F.col("n_tokens") >= 10) & (F.col("mean_inv_prob") <= 35.0))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    members = connected_components(lsh_candidate_pairs(minhash_bands(fdocs)))
    sizes = fdocs.select(
        F.col("doc_id").alias("node"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    drops = dedup_drop_list(members, sizes).select("doc_id")
    clean = fdocs.join(drops, "doc_id", "left_anti")
    return segment_dedup(clean, seg_tokens=10)


def q_ts6_ewma(spark, sf_dir):
    # exponentially-weighted moving average per user (the classic
    # streaming smoother; α = 1/4 keeps every step a single
    # exact-rounded double op). Bit-exact cross-engine by the lm.py
    # ordered-fold contract: events fold in (ts, event_id) order,
    # acc ← acc + (x − acc)/4, seeded by the first value — one
    # groupBy(user) shuffle, per-task memory bounded by a user's
    # event count (events-per-entity, not corpus-sized).
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("_a"))
        .select(
            "user_id",
            F.size("_a").cast("int").alias("n_events"),
            F.aggregate(
                F.slice(F.col("_a"), 2, F.greatest(F.size("_a") - 1, F.lit(0))),
                F.element_at(F.col("_a"), 1)["value"],
                lambda acc, s: acc + (s["value"] - acc) / F.lit(4.0),
            ).alias("ewma"),
        )
    )


def q_gr4_triangles(spark, sf_dir):
    # triangle counting over the near-dup citation graph — the local
    # clustering signal a dedup-graph audit publishes (triangles ⇒
    # transitive duplicate families; pure pairs ⇒ chain/boilerplate
    # structure). Exact and integer: two self-equi-joins of the
    # canonicalized a<b edge list (wedge a<b<c closed by (a,c)) —
    # never an all-pairs product; each triangle counted once, then
    # exploded to its three corners for per-node counts.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    e = (
        lsh_candidate_pairs(minhash_bands(docs))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("doc_id")
    )
    return (
        corners.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def q_gr5_label_prop(spark, sf_dir):
    # community detection over the near-dup graph: synchronous
    # label propagation, 3 deterministic rounds ((count desc, label
    # asc) adoption — a pure function of the graph, unlike async
    # LPA). The DENSITY complement to dd9's connectivity clusters:
    # a bridge edge between two duplicate families keeps them one
    # CC component but two communities.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        label_propagation_communities,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs)).select("a", "b").distinct()
    out = label_propagation_communities(pairs, rounds=3)
    return out.select(F.col("node").alias("doc_id"), "community")


def q_tp10_budget_select(spark, sf_dir):
    # data-constrained scaling: keep the best-quality docs (lowest
    # LM mean inverse probability) whose cumulative tokens fit a
    # 20k budget — two-phase prefix sum in quality order, no global
    # single-partition window over the corpus
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        budget_select,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        unigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return budget_select(unigram_lm_scores(docs), budget=20000)


def q_tp11_curriculum_order(spark, sf_dir):
    # curriculum schedule: dense global position in easy→hard order
    # (ascending LM mean inverse probability, doc_id tiebreak),
    # computed as a two-phase bucketed rank — floor(score) is the
    # deterministic monotone bucket — never a corpus-wide
    # single-partition window
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        global_order_index,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        unigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_lm_scores(docs)
    return global_order_index(
        scores,
        ["mean_inv_prob", "doc_id"],
        F.floor(F.col("mean_inv_prob")).cast("bigint"),
        index_col="curriculum_pos",
    ).select("doc_id", "curriculum_pos")


def q_dc3_leakage_safe_split(spark, sf_dir):
    # leakage-safe train/eval split: assign whole NEAR-DUP CLUSTERS
    # (LSH pairs → connected components; singletons are their own
    # cluster) to a split by cluster-id hash, so no near-duplicate
    # pair ever straddles train/eval — the eval-contamination failure
    # a doc-level random split cannot prevent
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    cl = dup_clusters(docs, lsh_candidate_pairs(minhash_bands(docs)))
    split = F.when(
        F.pmod(
            hash32(
                F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
            ),
            F.lit(10),
        )
        < 9,
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return cl.select("doc_id", "cluster_id", split.alias("split"))


def q_st7_stream_corpus_ingest(spark, sf_dir):
    # continuous corpus ingest: the documents table arrives as THREE
    # id-ordered micro-batches; each batch probes the persistent band
    # index (incremental LSH — work ∝ |batch|, never |corpus|²),
    # drops near-dups of anything earlier, segment-dedups against the
    # seen-segment state, and idempotently appends. Keep-earliest
    # makes the fold prefix-stable, so the final state equals the
    # batch twin (and the plain-SQL oracle) for any id-ordered split.
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from enriched_crime_incident_data_pipeline_spark.streaming.corpus_ingest import (
        run_corpus_ingest_stream,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    t = pq.read_table(src).sort_by("doc_id")
    n = t.num_rows
    base = tempfile.mkdtemp(prefix="spark_graft_st7_")
    docs_dir = os.path.join(base, "docs")
    os.makedirs(docs_dir)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = os.path.join(docs_dir, f"batch{i}.parquet")
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), path)
        # file-stream source processes oldest-mtime first: pin the
        # arrival order to the id order the keeper rule assumes
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))
    schema = spark.read.parquet(src).schema
    state_dir = os.path.join(base, "state")
    os.makedirs(state_dir)
    out = run_corpus_ingest_stream(spark, docs_dir, schema, state_dir)
    # detach the result from the on-disk state (localCheckpoint pins
    # the rows in block storage), then remove the whole temp root —
    # docs, state parquet, and the per-run streaming checkpoint — so
    # repeated selfcheck/bench invocations don't leak under /tmp
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


def q_st8_stream_decontaminate(spark, sf_dir):
    # continuous eval-contamination guard: the training-doc stream
    # shingles 8-grams map-only and probes the BROADCAST static
    # eval-gram set (eval benchmarks are MBs, the corpus is TBs — the
    # stream never shuffles); dropDuplicates emits each contaminated
    # doc id once. Bounded AvailableNow run ≡ the batch probe.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        doc_ngrams,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_grams = (
        doc_ngrams(docs.filter(F.col("doc_id") % 7 == 0), 8)
        .select("gram")
        .distinct()
    )
    train_stream = stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 != 0
    )
    hits = (
        doc_ngrams(train_stream, 8)
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )
    return run_available_now(
        hits, "st8_decontaminate", "append", state_partitions=8
    )






def q_ts5_ohlc_downsample(spark, sf_dir):
    # time-series downsampling to hourly OHLC bars: open/close via
    # min_by/max_by on (ts, event_id) — map-side-combinable argmin/
    # argmax, no per-bucket sort window; one shuffle on the bucket
    ev = load_table(spark, sf_dir, "events")
    val = F.col("value").cast("double")
    # DuckDB's min_by/max_by take scalar ordering keys only — a
    # fixed-width zero-padded (epoch_us, event_id) string is totally
    # ordered identically to the numeric tuple in both engines
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by(val, key).alias("open"),
            F.max(val).alias("high"),
            F.min(val).alias("low"),
            F.max_by(val, key).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def q_dq3_volume_anomaly(spark, sf_dir):
    # ingest-volume anomaly monitor: daily event counts vs the robust
    # MAD band — flag days where |count - median| > 3·MAD (the
    # data-quality tripwire a continuous pipeline runs after every
    # load). Daily counts are a map-side-combinable groupBy; the
    # median/MAD scalars broadcast back; all comparisons exact.
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    med = daily.agg(F.expr("percentile(n, 0.5)").alias("med"))
    dev = daily.crossJoin(F.broadcast(med))
    mad = dev.agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(n - med), 0.5)").alias("mad"),
    )
    return (
        daily.crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.col("n").cast("bigint").alias("n"),
            (
                F.abs(F.col("n").cast("double") - F.col("med"))
                > F.lit(3.0) * F.col("mad")
            )
            .cast("int")
            .alias("is_anomaly"),
        )
    )


def q_st9_stream_hll(spark, sf_dir):
    # continuous distinct-count: the HLL register table IS a streaming
    # aggregation — max-per-register is order-insensitive and
    # mergeable, exactly what makes HLL a streaming sketch; the
    # bounded complete-mode AvailableNow run equals the batch register
    # table bit-for-bit. State is 1024 rows forever, regardless of
    # stream length.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_registers,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    li = stream_table(spark, sf_dir, "lineitem")
    regs = hll_registers(li, F.col("l_partkey").cast("string"))
    out = regs.select(
        F.col("register").cast("bigint").alias("register"),
        F.col("rho").cast("bigint").alias("rho"),
    )
    return run_available_now(out, "st9_hll", "complete", state_partitions=8)



def q_sk8_heavy_hitters(spark, sf_dir):
    # exact frequent items, sketch-then-verify: CMS counters (one
    # mergeable agg) ride the row filter as a literal array —
    # array_min over d coordinates per row, no join, no distinct
    # pass; only sketch survivors reach the exact groupBy + HAVING
    # (CMS never underestimates ⇒ no false negatives, collisions die
    # in the verify). Output == plain GROUP BY HAVING, by
    # construction, at any sketch size.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        heavy_hitters_exact,
    )

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact(
        ev, F.col("user_id").cast("string"), threshold=80
    )


def q_st18_stream_word_hist(spark, sf_dir):
    # continuous word-histogram maintenance — the tok5 tokenizer-
    # training feeder as a stream: (word, freq) IS a streaming
    # aggregation (counts merge across micro-batches, order-
    # insensitive), so arriving documents keep the histogram current
    # and character-BPE training can re-run over the maintained state
    # at any time WITHOUT rescanning the corpus. State is bounded by
    # the vocabulary (Zipf-small), not the stream length; the
    # AvailableNow complete-mode run equals the batch histogram
    # exactly (same oracle as tok5's wh stage).
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    docs = stream_table(spark, sf_dir, "documents")
    hist = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return run_available_now(
        hist, "st18_word_hist", "complete", state_partitions=8
    )


def q_st19_stream_heavy_hitters(spark, sf_dir):
    # continuous frequent-items: the per-key count table IS a
    # streaming aggregation (counts merge per micro-batch); the ≥ T
    # read-out filters the maintained state, so "which keys are heavy
    # RIGHT NOW" is query-time work over state bounded by the key
    # domain, not the stream length. Batch twin: sk8 (whose CMS pass
    # is the work-gate for enormous domains; the state table here is
    # the exact verify layer kept continuously current).
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    ev = stream_table(spark, sf_dir, "events")
    counts = (
        ev.select(F.col("user_id").cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_available_now(
        counts, "st19_heavy", "complete", state_partitions=8
    )
    return out.filter(F.col("n") >= 80)


def q_st16_stream_quantile(spark, sf_dir):
    # continuous quantiles: the histogram bucket→count table IS a
    # streaming aggregation (counts merge across micro-batches), the
    # same property that makes it a distributed sketch (sk7). State
    # is ~#buckets rows forever, bounded by the VALUE DOMAIN, not the
    # stream length. The quantile read-out runs as a batch query over
    # the maintained sketch — query-time work independent of how much
    # data has streamed past. AvailableNow run ≡ the batch sketch,
    # same oracle SQL as the batch formulation.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        histogram_buckets,
        histogram_quantile_readout,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    ev = stream_table(spark, sf_dir, "events")
    buckets = histogram_buckets(ev, F.col("value"), 5.0)
    state = run_available_now(
        buckets, "st16_quantile", "complete", state_partitions=8
    )
    return histogram_quantile_readout(
        state, 5.0, qs=((1, 4), (1, 2), (19, 20), (99, 100))
    )


def q_st10_stream_embed_probe(spark, sf_dir):
    # continuous SemDeDup ingest probe: arriving vectors (vec_id % 5
    # == 0) assign to the corpus' IVF centroids via a STATELESS row
    # expression (no groupBy state on the stream), then stream-static
    # equi-join the corpus within their cluster and keep cosine >=
    # 0.3 matches — the incremental twin of dd14's pair generator:
    # work per vector ∝ its cluster's corpus size, never |corpus|.
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        ivf_assignments,
        stateless_ivf_assign,
    )
    from enriched_crime_incident_data_pipeline_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    cent_rows = [
        (r["vec_id"], r["embedding"])
        for r in corpus.filter(F.col("vec_id") < 16).collect()
    ]
    static = (
        corpus.join(ivf_assignments(corpus, 16).select("vec_id", "cluster"), "vec_id")
        .select(
            F.col("vec_id").alias("match_id"),
            F.col("embedding").alias("_bvec"),
            l2_norm(F.col("embedding")).alias("_bn"),
            "cluster",
        )
    )
    stream = stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 5 == 0
    )
    probes = stateless_ivf_assign(stream, cent_rows).select(
        "vec_id",
        F.col("embedding").alias("_avec"),
        l2_norm(F.col("embedding")).alias("_an"),
        "cluster",
    )
    hits = (
        probes.join(static, "cluster")
        .withColumn(
            "cosine",
            cosine_from_norms(
                F.col("_avec"), F.col("_bvec"), F.col("_an"), F.col("_bn")
            ),
        )
        .filter(F.col("cosine") >= 0.3)
        .select("vec_id", "match_id", "cosine")
    )
    return run_available_now(
        hits, "st10_embed_probe", "append", state_partitions=8
    )


def q_corpus_build4(spark, sf_dir):
    # the data-constrained-scaling recipe composed from the round-3
    # operators: a curated seed split (doc_id % 10 < 2) trains the
    # quality LM (ta14, CCNet move); candidates are scored under it,
    # the best-scored prefix fitting a 20k-token budget is selected
    # (tp10, two-phase prefix sum), and every selected doc gets its
    # dense curriculum position easy->hard (tp11, value-bucketed
    # global rank). Seed counts broadcast; no corpus self-join
    # anywhere; no single-partition window over the corpus.
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        budget_select,
        global_order_index,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        seed_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = seed_lm_scores(
        docs.filter(F.col("doc_id") % 10 < 2),
        docs.filter(F.col("doc_id") % 10 >= 2),
    )
    picked = budget_select(
        scored, budget=20000, quality_col="seed_mean_inv_prob"
    )
    ranked = global_order_index(
        picked.join(scored.select("doc_id", "seed_mean_inv_prob"), "doc_id"),
        ["seed_mean_inv_prob", "doc_id"],
        F.floor(F.col("seed_mean_inv_prob")).cast("bigint"),
        index_col="curriculum_pos",
    )
    return ranked.select("doc_id", "n_tokens", "cum_tokens", "curriculum_pos")



def q_st11_stream_ohlc(spark, sf_dir):
    # continuous OHLC bars: the ts5 aggregation as a complete-mode
    # streaming window — min_by/max_by on the fixed-width
    # (epoch_us, event_id) key are order-insensitive and mergeable
    # across micro-batches, so the bounded AvailableNow run equals
    # the batch bars exactly
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_events,
    )

    s = stream_events(spark, sf_dir)
    val = F.col("value").cast("double")
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    bars = (
        s.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min_by(val, key).alias("open"),
            F.max(val).alias("high"),
            F.min(val).alias("low"),
            F.max_by(val, key).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "open", "high", "low", "close", "n",
        )
    )
    return run_available_now(bars, "st11_ohlc", "complete", state_partitions=8)



def q_st12_stream_temperature_sample(spark, sf_dir):
    # continuous corpus sampling at ingest: per-stratum keep
    # thresholds derive from the STATIC corpus composition (one
    # map-side count, broadcast); the document stream then filters
    # with the pure hash predicate — stateless map, no stream
    # shuffle. Bounded AvailableNow run ≡ the batch tp12 kept set.
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_table,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        hash32,
    )

    stratum = (
        F.when(F.col("doc_id") % 10 < 6, "heavy")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("light")
    )
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "stratum", stratum
    )
    counts = docs.groupBy("stratum").agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        "stratum",
        F.floor(
            F.sqrt(
                F.col("_nmin").cast("double") / F.col("_n").cast("double")
            )
            * F.lit(4294967296.0)
        ).alias("_thr"),
    )
    stream = stream_table(spark, sf_dir, "documents").withColumn(
        "stratum", stratum
    )
    h = hash32(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    kept = (
        stream.join(F.broadcast(rates), "stratum")
        .filter(h < F.col("_thr"))
        .select("doc_id", "stratum")
    )
    return run_available_now(
        kept, "st12_temp_sample", "append", state_partitions=8
    )


def q_corpus_build3(spark, sf_dir):
    # the capstone: the FULL pretraining-data recipe as one declared
    # DAG — lang-ID filter → LM-quality filter (LM trained on the
    # surviving subset) → PII scrub → 8-gram decontamination against
    # a held-out eval split → near-dup keeper drop (MinHash/LSH → CC
    # → keep-longest) → corpus-wide segment dedup → mixture sample to
    # the target source composition → concat-and-chunk packing →
    # deterministic shard shuffle. Every model artifact (LM token
    # counts, band index, eval-gram set, quotas) is computed on the
    # stage's own input, broadcast where small; the corpus is never
    # self-joined outside the banded LSH stage.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
        dedup_drop_list,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        mixture_sample,
        pack_assignments,
        shuffle_shards,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        segment_dedup,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        doc_ngrams,
        with_contamination_flag,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.lm import (
        with_unigram_lm_scores,
    )
    from enriched_crime_incident_data_pipeline_spark.operators.parallelism import (
        fan_out,
    )
    # 0. width correction at the SCAN (r5, measured A/B at sf0.1:
    #    8.4 vs 9.1 s): the local test file is one parquet split, so
    #    without this the whole lang→LM→scrub→decontaminate chain
    #    runs single-threaded. One round-robin exchange of the raw
    #    bytes up front parallelizes every downstream stage; the cut
    #    makes the wide form the one the three artifact consumers
    #    below re-read. On a cluster the scan already arrives split
    #    and fan_out is conf-disabled.
    # LAZY cut (r5 barrier trim): the first consumer is the `art`
    # union collect below, which scans every partition of both
    # branches — Spark's post-job doCheckpoint then owns the blocks,
    # so the dedicated materialization job disappears while the
    # multi-consumer dedup (endocs/eval_docs/cdocs all re-read the
    # blocks) is unchanged. Plans stay truncated either way: lazy
    # Dataset.localCheckpoint still swaps in the LogicalRDD node.
    docs = fan_out(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
    # 1. language filter: keep docs the stopword heuristic calls 'en'
    endocs = docs.filter(lang_id(F.col("text")) == "en").select(
        "doc_id", "source", "text"
    )
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    # model artifacts in ONE driver job (r5): the LM unigram counts
    # (trained on the lang-filtered subset) and the eval-split 8-gram
    # set are both tiny broadcast dimensions; collecting them
    # separately costs a full job barrier each, so they ride one
    # tagged union. Same bits as the per-function collects.
    art = (
        fan_out(endocs)
        .select(F.explode(tokens(F.col("text"))).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit("tok").alias("kind"), "k", "c")
        .unionByName(
            doc_ngrams(eval_docs, 8)
            .select("gram")
            .distinct()
            .select(
                F.lit("gram").alias("kind"),
                F.col("gram").alias("k"),
                F.lit(0).cast("bigint").alias("c"),
            )
        )
        .collect()
    )
    cmap = {r["k"]: r["c"] for r in art if r["kind"] == "tok"}
    lm_model = (cmap, float(sum(cmap.values()) + len(cmap)))
    egrams = frozenset(r["k"] for r in art if r["kind"] == "gram")
    # 2. LM quality, trained on the lang-filtered subset itself.
    #    r5: the score is appended in-row by the Arrow fold kernel,
    #    so the filter needs no ids→docs join-back.
    qdocs = (
        with_unigram_lm_scores(endocs, model=lm_model)
        .filter((F.col("n_tokens") >= 10) & (F.col("mean_inv_prob") <= 40.0))
        .select("doc_id", "source", "text")
    )
    # 3. PII scrub (JVM regex, whole-stage codegen)
    sdocs = qdocs.select(
        "doc_id", "source", scrub_pii(F.col("text")).alias("text")
    )
    # 4. decontamination: eval split = every 50th ORIGINAL doc.
    #    r5 fusion: the contamination flag is computed IN-ROW (Arrow
    #    kernel probing the broadcast eval-gram frozenset over the
    #    row's own grams), so stages 1-4 are ONE linear map stage
    #    with a single cut at the end: the r4 shape needed a `train`
    #    checkpoint (the report relation join-back would otherwise
    #    double-execute the lang→LM→PII lineage) plus a per-gram
    #    explode + groupBy shuffle + two joins, all gone. At 100 TB
    #    this whole chain is the single bronze→silver pass.
    # cdocs is referenced by three downstream consumers (band index,
    # size table, anti-join) — materialize it once so the plan tree
    # stays linear in stage count, not exponential in reference count.
    # r6 fusion (the r5 verdict's top item): the SAME materialization
    # pass also computes every per-row artifact the dedup stages need
    # — the 16-hash minhash signature (mh0..mh15), the token count,
    # and the 10-token segment-hash array — so the band index, the
    # keeper size table, and the segment pass all read COLUMNS of the
    # checkpointed relation instead of re-tokenizing/re-hashing the
    # text in three separate scans. At 100 TB those were three full
    # corpus re-reads; now the text is tokenized once for artifacts
    # (here) and once more only in the rebuild slice.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        bands_from_sigs,
        keep_first_segment,
        with_minhash_cols,
        with_segment_hash_array,
    )

    cdocs = (
        with_segment_hash_array(
            with_minhash_cols(
                with_contamination_flag(
                    sdocs.filter(F.col("doc_id") % 50 != 0),
                    eval_docs,
                    n=8,
                    eval_grams=egrams,
                )
                .filter(F.col("contaminated") == 0)
                .select(
                    "doc_id",
                    "source",
                    "text",
                    token_count(F.col("text")).alias("n_tokens"),
                )
            ),
            seg_tokens=10,
        )
        .localCheckpoint(eager=True)
    )
    # 5. near-dup keeper drop over the scrubbed survivors — banding
    # reads the precomputed signature columns (no shingle hashing in
    # the candidate join's lineage, which also makes the CC driver
    # tier's sizing take cheap to re-enter)
    members = connected_components(
        lsh_candidate_pairs(bands_from_sigs(cdocs))
    )
    sizes = cdocs.select(F.col("doc_id").alias("node"), "n_tokens")
    drops = dedup_drop_list(members, sizes).select("doc_id")
    # stage boundary (r5): kdocs feeds BOTH the segment pass/rebuild
    # and the source join-back below — one cut here replaces
    # segment_dedup's internal pin AND stops the drop-list anti-join
    # from executing twice (once per consumer)
    # lazy: the segment pass's keeper aggregation scans kdocs in
    # full, so the blocks materialize inside that job (one barrier
    # saved)
    kdocs = cdocs.join(drops, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    # 6. corpus-wide segment dedup (10-token segments, keep-first),
    # composed from segment_dedup's own halves: the segment relation
    # is a posexplode of the PRECOMPUTED hash array (bit-identical to
    # doc_segments — empty docs carry an empty array and emit no
    # rows) and the keeper rule is the shared keep_first_segment.
    # NO TEXT REBUILD (r6): nothing downstream reads deduped text —
    # mixture_sample consumes (doc_id, source) and packing consumes
    # token counts — so rebuilding, materializing, and re-tokenizing
    # the deduped corpus existed only to COUNT its tokens. That count
    # is exact arithmetic over the kept indices: every segment is 10
    # tokens except the last (n_tokens − 10·(n_segs−1)), so per doc
    # it's 10·(kept full segs) + (last length if the max kept index
    # is the last — indices are distinct, so only the max can be it).
    # Manual column pruning through the rebuild: the query output is
    # bit-identical (pinned by the unchanged oracle), and at 100 TB
    # the silver→gold pass stops carrying document text entirely. A
    # consumer that needs the text itself uses segment_dedup's
    # rebuild_winners (still the dd11 operator).
    # Cut at surv: tiny (id, source, two ints) rows feed the mixture
    # quotas, the ranked sample, the pack sizes, and the final join.
    # lazy: mixture_sample's quota broadcast-build aggregates every
    # surv partition before the rank stage runs, so the first job
    # through `sampled` materializes these blocks too
    segs = kdocs.select(
        "doc_id", F.posexplode("seg_hashes").alias("seg_idx", "seg_hash")
    )
    stats = (
        keep_first_segment(segs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.max("seg_idx").alias("_mx"),
        )
    )
    n_segs = F.floor((F.col("n_tokens") + F.lit(9)) / F.lit(10)).cast("int")
    has_last = (F.col("_mx") == n_segs - F.lit(1)).cast("bigint")
    last_len = (
        F.col("n_tokens").cast("bigint")
        - F.lit(10) * (n_segs - F.lit(1)).cast("bigint")
    )
    surv = (
        stats.join(kdocs.select("doc_id", "source", "n_tokens"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_kept",
            (
                F.lit(10) * (F.col("n_kept").cast("bigint") - has_last)
                + has_last * last_len
            ).alias("kept_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    # 7. mixture sample to the target composition over the survivors;
    # the sample id-list feeds packing, sharding, and the final join —
    # materialize it once (it is ids+source only): without the cut the
    # quota-ranking subplan (and its 1-row scalar BNLJs) replicates
    # into every consumer, and the r5 A/B showed no wall-clock win to
    # offset the plan blow-up.
    # lazy (r5 session-2): the LogicalRDD truncation — which is what
    # kept the quota subplan's scalar BNLJs out of every consumer —
    # happens at call time regardless of eagerness; the final job's
    # first full scan materializes the blocks, deleting the last
    # dedicated barrier. (DROPPING the cut was measured and reverted
    # in the r5 trail above — plan replication; lazy keeps the plans
    # bit-identical to eager.)
    sampled = mixture_sample(surv, MIXTURE_TARGETS_BP).localCheckpoint(
        eager=False
    )
    sdocs2 = sampled.join(surv.select("doc_id", "kept_tokens"), "doc_id")
    # 8. packing offsets over the sampled corpus (two-phase prefix
    # sum over the precomputed kept-token sizes — no text column)
    packed = pack_assignments(sdocs2, size_col="kept_tokens")
    # 9. deterministic shard shuffle of the final examples
    shards = shuffle_shards(sampled)
    return (
        sampled.join(packed, "doc_id")
        .join(shards, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "start_offset",
            "pack_id",
            "shard",
            "position",
        )
    )


def q_ss9_cluster_purity(spark, sf_dir):
    # unsupervised-clustering evaluation against the labeled column:
    # per-IVF-cluster majority label and purity in basis points
    # (integer DIV — no float-cast divergence)
    emb = load_table(spark, sf_dir, "embeddings")
    assign = ivf_assignments(emb, n_centroids=8)
    labeled = assign.join(emb.select("vec_id", "label"), "vec_id")
    cells = labeled.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = cells.groupBy("cluster").agg(
        F.max_by(
            "label", F.struct(F.col("n"), F.col("label"))
        ).alias("majority_label"),
        F.max(F.struct(F.col("n"), F.col("label"))).getField("n").alias(
            "majority_n"
        ),
        F.sum("n").alias("total"),
    )
    return top.select(
        "cluster",
        "majority_label",
        "majority_n",
        "total",
        F.expr("CAST((majority_n * 10000) DIV total AS BIGINT)").alias(
            "purity_bp"
        ),
    )


def q_ss7_pq_codes(spark, sf_dir):
    # product-quantization codes: 8 subspaces × deterministic
    # 16-centroid codebooks → 8 small ints per vector (32× smaller
    # than float32); the other half of scale ANN alongside IVF
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        pq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_codes(emb)


def q_ss8_pq_adc_topk(spark, sf_dir):
    # asymmetric-distance top-k over the PQ codes: scan touches only
    # 1 byte/subspace/vector + a broadcast 8×16 lookup table
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        pq_adc_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, query_vec_id=0, k=10)


def q_ss10_ivf_pq_search(spark, sf_dir):
    # the composed production ANN read path (the 1 B+-vector shape):
    # IVF probe (top-2 clusters by query-centroid cosine, broadcast
    # centroids) → PQ-ADC shortlist over candidate codes only (1
    # byte/subspace scan + broadcast 8×16 LUT) → exact cosine re-rank
    # of the 40-row shortlist. Never evaluates a full-corpus distance.
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        ivf_pq_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(emb, query_vec_id=0, k=10, nprobe=2, shortlist=64)


def q_tp5_sliding_chunks(spark, sf_dir):
    # RAG/context-window chunking: overlapping token windows, map-only
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        sliding_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sliding_chunks(docs, chunk_tokens=16, stride=12)


def q_tp6_group_sample(spark, sf_dir):
    # deterministic k-per-group sample (reservoir-equivalent, stable)
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        group_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return group_sample(docs, k=3)


def q_st4_stream_dedup(spark, sf_dir):
    # watermarked streaming dedup feeding a streaming aggregation —
    # the exactly-once ingest shape for at-least-once feeds
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_events,
    )

    s = stream_events(spark, sf_dir)
    dd = s.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    agg = dd.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return run_available_now(agg, "st4_dedup", "complete", state_partitions=8)


def q_st5_stream_stream_join(spark, sf_dir):
    # stream-stream interval join: purchases ⋈ views of the same user
    # within the preceding hour. Watermarks on BOTH sides + the
    # time-range conjunct bound the join state (views older than the
    # range + watermark are evicted) — the shape that stays flat on an
    # unbounded feed. Bounded AvailableNow run ≡ the batch twin.
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_events,
    )

    # project to the 3 join/output columns BEFORE the join: the
    # stream-stream join buffers BOTH inputs in the state store, so
    # every non-projected column (props JSON, page, amounts…) would
    # be serialized into state row-by-row — at sf0.1 that alone made
    # the join ~2× slower (see SCALING.md round-4 st5 note); on an
    # unbounded feed it's the difference between state ∝ needed bytes
    # and state ∝ full-event bytes
    p = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "2 hours")
        .alias("p")
    )
    v = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "2 hours")
        .alias("v")
    )
    j = p.join(
        v,
        F.expr(
            "p.user_id = v.user_id"
            " AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"
        ),
    )
    out = j.select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("p.user_id").alias("user_id"),
    )
    # 8 state partitions: sized to the sf0.1 state volume (~40 k
    # buffered rows) — see run_available_now's docstring; 32 was pure
    # per-store commit overhead (the round-3 "st5 regression" was
    # noise around that fixed cost, root-caused in SCALING.md r4)
    return run_available_now(out, "st5_join", "append", state_partitions=8)


def q_ta7_quality_filter(spark, sf_dir):
    # Gopher-style keep/drop verdict composed from the ta2 signals —
    # the actual corpus-filter decision, not just the features
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    keep = (
        (feats["n_tokens"] >= 10)
        & (feats["n_tokens"] <= 500)
        & (feats["stopword_ratio"] >= 0.05)
        & (feats["digit_ratio"] <= 0.2)
        & (feats["punct_ratio"] <= 0.2)
    )
    return docs.select("doc_id", keep.alias("keep"))


def q_inc_agg_merge(spark, sf_dir):
    # incremental aggregation: three disjoint arrival batches folded
    # through algebraic state == full-history recompute (exactly)
    from enriched_crime_incident_data_pipeline_spark.operators.incremental import (
        agg_state,
        finalize_agg,
        merge_agg_states,
    )

    li = load_table(spark, sf_dir, "lineitem")
    states = [
        agg_state(li.filter(F.col("l_orderkey") % 3 == i), "l_returnflag", "l_quantity")
        for i in range(3)
    ]
    return finalize_agg(merge_agg_states(states, "l_returnflag"))


def q_ol1_zscore_outliers(spark, sf_dir):
    # per-group z-score outliers from decimal-exact moments — one agg
    # pass, broadcast the tiny per-group stats back onto the rows
    from enriched_crime_incident_data_pipeline_spark.functions.stats import (
        dec2,
        mean_from_moments,
        moments,
        var_from_moments,
    )

    ev = load_table(spark, sf_dir, "events")
    m = moments(F.col("value"))
    stats = ev.groupBy("event_type").agg(
        m["n"].alias("_n"), m["s"].alias("_s"), m["ss"].alias("_ss")
    )
    stats = stats.select(
        "event_type",
        mean_from_moments(F.col("_n"), F.col("_s")).alias("_mean"),
        F.sqrt(var_from_moments(F.col("_n"), F.col("_s"), F.col("_ss"))).alias("_sd"),
    )
    z = (dec2(F.col("value")).cast("double") - F.col("_mean")) / F.col("_sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.col("_sd") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.5)
        .select("event_id", "event_type", "value", "z")
    )


def q_hist1_totalprice(spark, sf_dir):
    # fixed-width histogram binning: pure map + one groupBy
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / F.lit(20000.0)).cast("int")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


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


_SQL1 = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(rank() OVER (ORDER BY count(*) DESC, o_orderpriority)
                AS INTEGER) AS priority_rank
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
"""


def q_sql1_sql_api(spark, sf_dir):
    # the engine's SQL surface: temp views + spark.sql — the same
    # ANSI text runs unchanged on the oracle engine
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        register_views,
    )

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SQL1)


def q_corpus_build(spark, sf_dir):
    # the whole training-corpus build, composed end-to-end from the
    # engine's own stages: quality keep/drop → near-dup clustering
    # keeps one canonical doc per cluster → concat-and-chunk packing
    # of the survivors. One declared query = the pipeline a 100 TB
    # corpus run executes.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        dup_clusters,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        pack_assignments,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    keep = (
        (feats["n_tokens"] >= 10)
        & (feats["n_tokens"] <= 500)
        & (feats["stopword_ratio"] >= 0.05)
        & (feats["digit_ratio"] <= 0.2)
        & (feats["punct_ratio"] <= 0.2)
    )
    canonical = (
        dup_clusters(docs, lsh_candidate_pairs(minhash_bands(docs)))
        .filter(F.col("is_canonical"))
        .select("doc_id")
    )
    kept = (
        docs.withColumn("_keep", keep)
        .filter(F.col("_keep"))
        .join(canonical, "doc_id")
        .select("doc_id", "text")
    )
    return pack_assignments(kept, budget=256)


def q_ts1_gapfill(spark, sf_dir):
    # densify sparse per-user activity to one row per (user, day),
    # zero-filling silent days — sequence+explode grid, one join
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        gapfill_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("user_id") < 40)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return gapfill_daily(
        daily,
        ["user_id"],
        "day",
        "2024-01-01",
        "2024-01-30",
        fill={"n_events": 0},
    )


def q_ts2_forward_fill(spark, sf_dir):
    # carry each user's last observed daily purchase value forward
    # over the dense day grid (leading days before first purchase
    # stay NULL)
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        forward_fill,
        gapfill_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("day_value")
        )
    )
    dense = gapfill_daily(daily, ["user_id"], "day", "2024-01-01", "2024-01-30")
    return forward_fill(dense, ["user_id"], "day", "day_value", "filled_value").select(
        "user_id", "day", "filled_value"
    )


def q_j8_full_outer(spark, sf_dir):
    # FULL OUTER join of two sparse per-nation aggregates — rows
    # survive from either side with NULLs on the other
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    s = (
        supp.filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    c = (
        cust.filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return (
        s.alias("s")
        .join(c.alias("c"), F.col("s.nk") == F.col("c.nk"), "full_outer")
        .select(
            F.coalesce(F.col("s.nk"), F.col("c.nk")).alias("nk"),
            "n_supp",
            "n_cust",
        )
    )


def q_ta5_token_pieces(spark, sf_dir):
    # BPE-ish sub-word piece count: letter runs, single digits,
    # punctuation runs — a cheap tokenizer-cost estimator
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"), 0
    )
    return docs.select(
        "doc_id", F.size(pieces).cast("int").alias("n_pieces")
    )


def q_mm2_media_meta(spark, sf_dir):
    # binary-column metadata path (byte length) — SQL-expressible twin
    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs)
    return media.select(
        "media_id", "kind", F.length("content").cast("bigint").alias("n_bytes")
    )


# ---------------------------------------------------------------------------
# structured streaming (bounded AvailableNow runs, oracle = batch twin)
# ---------------------------------------------------------------------------


def q_st1_stream_tumbling(spark, sf_dir):
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        stream_events,
        tumbling_counts,
    )

    s = stream_events(spark, sf_dir)
    return run_available_now(
        tumbling_counts(s), "st1_tumbling", "complete", state_partitions=8
    )


def q_st13_stream_sliding(spark, sf_dir):
    # overlapping sliding windows (10 min every 5 min) as a
    # watermarked streaming aggregation; the bounded AvailableNow run
    # must equal the batch expansion (each event in exactly 2
    # windows), which is what the oracle computes
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        sliding_counts,
        stream_events,
    )

    s = stream_events(spark, sf_dir)
    return run_available_now(
        sliding_counts(s), "st13_sliding", "complete", state_partitions=8
    )


def q_st2_stream_sessions(spark, sf_dir):
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        run_available_now,
        session_counts_stateful,
        stream_events,
    )

    s = stream_events(spark, sf_dir)
    return run_available_now(
        session_counts_stateful(s), "st2_sessions", "update",
        state_partitions=8,
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


def _dec(c):
    return F.col(c).cast("decimal(18,2)")


def _rev_expr():
    # decimal-exact extendedprice*(1-discount), the common money term
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


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


def q_dc1_contamination(spark, sf_dir):
    # train/eval 8-gram decontamination: eval set = every 50th doc;
    # eval-gram set broadcast, corpus never self-joins
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(train, eval_docs, n=8)


def q_dc6_flag_in_row(spark, sf_dir):
    # in-row decontamination flag (r5): the corpus-build FILTER shape —
    # the eval 8-gram set rides as a broadcast frozenset probed by an
    # Arrow kernel over each row's own grams (O(1) per gram,
    # early-exit per row); no per-gram explode, no groupBy shuffle, no
    # report join-back, so a build's scrub→decontaminate chain stays
    # one linear map stage. Truth value ≡ dc1's `contaminated`.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        with_contamination_flag,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source", "text"
    )
    return with_contamination_flag(train, eval_docs, n=8).select(
        "doc_id", "source", "contaminated"
    )


def q_dc8_scrub_spans(spark, sf_dir):
    # surgical decontamination (r5): remove ONLY the tokens covered by
    # an eval-colliding 8-gram and keep the rest of the document — the
    # graduated policy for high-value long docs (vs dc1+filter, which
    # drops the whole doc for one quoted benchmark item). Map-only
    # frozenset kernel building a coverage mask, O(d) per doc.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        scrub_contaminated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    return scrub_contaminated_spans(train, eval_docs, n=8)


def q_dc7_bloom_decontaminate(spark, sf_dir):
    # Bloom-filter decontamination (r5): the production structure for
    # blocklists too large to broadcast exactly — m bits regardless of
    # eval size. The filter rides as ONE packed array<long> bitset
    # (array element_at is O(1) positional access, the JVM answer to
    # the map-column linear-scan trap); probes are map-only k-md5
    # column expressions, no Python, no explode, no shuffle. md5
    # basis ⇒ even the false positives are engine-deterministic and
    # oracle-checked.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        bloom_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    return bloom_decontaminate(train, eval_docs, n=8)


def q_dc4_overlap_fraction(spark, sf_dir):
    # fractional contamination (GPT-3/PaLM-style): share of each
    # training doc's distinct 8-grams found in the eval set — the
    # graduated-policy companion to dc1's boolean flag
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        ngram_overlap_fraction,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return ngram_overlap_fraction(train, eval_docs, n=8)


def q_dc2_cross_snapshot(spark, sf_dir):
    # incremental-corpus dedup: new snapshot (doc_id >= 250) anti-joined
    # against the previous snapshot's content fingerprints
    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.withColumn("fingerprint", doc_fingerprint(F.col("text")))
    old = with_fp.filter(F.col("doc_id") < 250)
    new = with_fp.filter(F.col("doc_id") >= 250)
    kept = cross_snapshot_new_docs(new, old, "fingerprint")
    return kept.select("doc_id", "fingerprint")


def q_ta8_repetition(spark, sf_dir):
    # Gopher-style repetition signals over word 2-grams
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 2)).alias("gram")
    )
    return repetition_features(grams)


def q_ta9_pii_scrub(spark, sf_dir):
    # PII redaction audit: deterministic synthetic PII injected per
    # doc (both engines inject identically), then regex scrub + counts
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("raw_text"),
    )
    counts = pii_counts(F.col("raw_text"))
    return injected.select(
        "doc_id",
        scrub_pii(F.col("raw_text")).alias("clean_text"),
        counts["n_emails"].cast("int").alias("n_emails"),
        counts["n_phones"].cast("int").alias("n_phones"),
    )


def q_tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


def q_wa1_lead_lag(spark, sf_dir):
    # day-over-day revenue delta; the lag window partitions by year so
    # no stage orders more than one year of daily aggregates on a
    # single partition (the daily rollup is already
    # bounded-cardinality)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(_dec("o_totalprice")).alias("rev_dec"))
    w = Window.partitionBy("yr").orderBy("day")
    prev = F.lag("rev_dec").over(w)
    return daily.select(
        "yr",
        "day",
        F.col("rev_dec").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        (F.col("rev_dec") - prev).cast("double").alias("delta"),
    )


def q_wa2_rolling(spark, sf_dir):
    # 7-row trailing frame over per-day order counts (ROWS BETWEEN);
    # the explicit sum/count division keeps the mean an exact
    # int-ratio on both engines
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy("yr").orderBy("day").rowsBetween(-6, 0)
    roll_sum = F.sum("n_orders").over(w)
    roll_cnt = F.count(F.lit(1)).over(w)
    return daily.select(
        "yr",
        "day",
        F.col("n_orders").cast("int").alias("n_orders"),
        roll_sum.cast("int").alias("roll7_orders"),
        (roll_sum.cast("double") / roll_cnt.cast("double")).alias("roll7_avg"),
    )


def q_wa3_range_frame(spark, sf_dir):
    # per-customer trailing-90-day spend: RANGE frame over an integer
    # day number — value-based frames include all peers, so ties on
    # the order date are handled identically in both engines
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("dayn"),
        _dec("o_totalprice").alias("price_dec"),
    )
    w = Window.partitionBy("o_custkey").orderBy("dayn").rangeBetween(-90, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.count(F.lit(1)).over(w).cast("int").alias("n_90d"),
        F.sum("price_dec").over(w).cast("double").alias("spend_90d"),
    )


def q_wa8_dist_functions(spark, sf_dir):
    # distribution analytics: percent_rank / cume_dist over the
    # per-segment balance order — both are exact ratios of integer
    # rank counts ((r-1)/(n-1), n_le/n), bit-identical cross-engine.
    # Partitioned by segment: no global single-partition window.
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_wa4_ntile(spark, sf_dir):
    # account-balance quartiles per market segment; deterministic
    # tie-break by custkey
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


def q_wa5_grouping_sets(spark, sf_dir):
    # explicit GROUPING SETS (finer than cube/rollup) with grouping()
    # markers distinguishing NULL-as-subtotal from NULL data
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               count(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


def q_wa6_unpivot(spark, sf_dir):
    # wide→long melt of part measures (Spark `unpivot`); values cast
    # to a common double type as unpivot requires
    part = load_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="measure",
        valueColumnName="value",
    )


def q_graph1_tree_paths(spark, sf_dir):
    # recursive-CTE workload without a recursive CTE: decimal-digit
    # parent tree over custkeys (parent = key/10, root 0), resolved by
    # pointer doubling in ⌈log₂ depth⌉ joins; oracle is a true
    # DuckDB WITH RECURSIVE
    from enriched_crime_incident_data_pipeline_spark.operators.hierarchy import (
        tree_paths,
    )

    cust = load_table(spark, sf_dir, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("node"),
        F.floor(F.col("c_custkey") / 10).cast("long").alias("parent"),
    )
    return tree_paths(edges)


def q_agg1_ordered_listagg(spark, sf_dir):
    # ordered string aggregation: collect → sort → join makes the
    # result order-deterministic regardless of partitioning (raw
    # collect_list order is partition-dependent and never exposed)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.year("o_orderdate").cast("int"))),
            ",",
        ).alias("active_years"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_arr1_token_sets(spark, sf_dir):
    # array set algebra over token arrays: distinct size, stopword
    # intersection, union with a literal vocabulary
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.col("text"), " "))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_distinct"),
        F.size(F.array_intersect(toks, sw)).alias("n_stop"),
        F.size(F.array_union(toks, sw)).alias("n_union"),
        F.size(F.array_except(toks, sw)).alias("n_content"),
    )


def q_funnel1_conversion(spark, sf_dir):
    # conversion funnel: per user, first view → first click after it →
    # first purchase after that; stage timestamps as min-aggregations
    # over conditional predecessors (one shuffle per stage, all on
    # user_id — co-partitioned, no window over the event stream)
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    funnel = (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
    )
    return funnel.select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        (
            F.col("first_click").isNotNull().cast("int")
            + F.col("first_purchase").isNotNull().cast("int")
            + F.lit(1)
        ).alias("stages_reached"),
    )


def q_retention1_cohorts(spark, sf_dir):
    # cohort retention: users grouped by signup week; per (cohort,
    # weeks-since-signup) distinct active users — two hash
    # aggregations and one broadcastable cohort join
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    active = ev.join(F.broadcast(cohorts), "user_id").select(
        "user_id",
        "cohort_week",
        (
            F.datediff(
                F.to_date(F.date_trunc("week", F.col("ts"))),
                F.to_date("cohort_week"),
            )
            / 7
        )
        .cast("int")
        .alias("week_n"),
    )
    return (
        active.filter(F.col("week_n") >= 0)
        .groupBy(F.to_date("cohort_week").alias("cohort_week"), F.col("week_n"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


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


def q_udf1_pandas_parity(spark, sf_dir):
    # the UDF-safety contract: an Arrow-batched Pandas UDF whose
    # result is bit-identical to the JVM expression twin (and to the
    # DuckDB oracle) — proves Python stages can swap in without a
    # correctness diff
    from enriched_crime_incident_data_pipeline_spark.functions.udfs import (
        token_count_udf,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count_udf(F.col("text")).alias("n_tokens")
    )


def q_udtf2_word_offsets(spark, sf_dir):
    # the table-function extensibility surface (Spark 4 Python UDTF):
    # one doc row → one row per word with running char offset; output
    # pinned equal to the relational twin (explode + running-sum
    # window) — UDTFs are the escape hatch, built-ins the hot path
    from enriched_crime_incident_data_pipeline_spark.functions.tablefns import (
        register_word_offsets,
    )

    register_word_offsets(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 100).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.idx, s.word, s.char_offset
        FROM _udtf_docs, LATERAL word_offsets(text) s
        """
    )


def q_scd3_temporal_lookup(spark, sf_dir):
    # point-in-interval dimension lookup: facts equi-join the SCD2
    # version table on the natural key, half-open containment as the
    # residual — time partitioning guarantees ≤1 version per fact.
    # Pinned equivalent to the as-of-join formulation in
    # tests/test_asof.py::test_scd2_containment_equals_asof
    from enriched_crime_incident_data_pipeline_spark.operators.scd import (
        scd2_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    dim = scd2_intervals(
        ev.filter(F.col("event_type").isin("signup", "purchase")).select(
            F.col("event_id").alias("dim_event_id"),
            "user_id",
            "ts",
            F.col("value").alias("dim_value"),
        ),
        ["user_id"],
        "ts",
        "dim_event_id",
    )
    facts = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = facts.join(
        dim,
        (facts["user_id"] == dim["user_id"])
        & (dim["valid_from"] <= facts["ts"])
        & (dim["valid_to"].isNull() | (facts["ts"] < dim["valid_to"])),
        "left",
    )
    return joined.select(
        facts["event_id"], facts["user_id"], facts["ts"],
        "dim_event_id", "dim_value",
    )


def q_geo1_grid_join(spark, sf_dir):
    # 2-D proximity self-join via grid blocking: cell equi-join +
    # exact Chebyshev residual, never a cartesian (plan-asserted)
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        grid_proximity_join,
    )

    cust = load_table(spark, sf_dir, "customer")
    points = cust.select(
        F.col("c_custkey").alias("pid"),
        (F.col("c_custkey") % 89).cast("int").alias("px"),
        (F.col("c_custkey") % 97).cast("int").alias("py"),
    )
    return grid_proximity_join(points, "pid", "px", "py", radius=1)



def q_geo2_grid_knn(spark, sf_dir):
    # bounded-radius nearest neighbor: grid-blocked directed
    # candidates (3x3 neighborhood equi-join), integer-exact squared
    # distance, min_by argmin per query point — no sort window, no
    # cartesian
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        grid_nearest_neighbor,
    )

    cust = load_table(spark, sf_dir, "customer")
    points = cust.select(
        F.col("c_custkey").alias("pid"),
        (F.col("c_custkey") % 89).cast("int").alias("px"),
        (F.col("c_custkey") % 97).cast("int").alias("py"),
    )
    return grid_nearest_neighbor(points, "pid", "px", "py", radius=2)


def q_fuzzy1_name_pairs(spark, sf_dir):
    # fuzzy dedup of near-identical names: prefix blocking + exact
    # levenshtein residual (the dirty-address clustering shape from
    # the reference's location strings)
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        fuzzy_name_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_name_pairs(cust, "c_custkey", "c_name", max_distance=1)


def q_er1_entity_clusters(spark, sf_dir):
    # entity resolution end-to-end: fuzzy-blocked name pairs (fuzzy1)
    # -> connected components -> one canonical entity per component
    # (root = min member id, its name is the canonical form) with a
    # member count. Blocking bounds the pair fan-out, CC edges scale
    # with the fuzzy-dup count (not the table), the canonical join is
    # a plain equi-join on the entity root.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
    )
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        fuzzy_name_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    pairs = fuzzy_name_pairs(cust, "c_custkey", "c_name", max_distance=1)
    cc = connected_components(pairs, "id_a", "id_b")
    members = (
        cust.select("c_custkey")
        .join(cc, cust["c_custkey"] == cc["node"], "left")
        .select(
            F.coalesce("cluster_id", F.col("c_custkey")).alias("entity_id"),
        )
    )
    canon = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("canonical_name"),
    )
    return (
        members.groupBy("entity_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_members"))
        .join(canon, "entity_id")
        .select("entity_id", "n_members", "canonical_name")
    )


def q_tp8_weighted_sample(spark, sf_dir):
    # quality-proportional sampling: keep probability = clamped
    # integer weight per row (longer docs likelier kept), hash-based
    # so the sample is engine- and layout-independent
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars") * 20, F.lit(9000)).cast("int")
    weighted = docs.withColumn("weight_bp", weight)
    kept = weighted_sample(weighted, F.col("weight_bp"))
    return kept.select("doc_id", "weight_bp")


def q_sk2_bloom(spark, sf_dir):
    # Bloom membership: filter built from the old snapshot's content
    # fingerprints, probed by every doc — md5 basis makes false
    # positives deterministic and oracle-checkable
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    bits = bloom_build(
        fp.filter(F.col("doc_id") < 250), F.col("fingerprint")
    )
    return bloom_probe(fp, bits, F.col("fingerprint"), "doc_id")


def q_sk3_cms(spark, sf_dir):
    # count-min frequency sketch over the lineitem partkey stream:
    # 4×1024 counters whatever the stream size; per-key estimate is
    # min over rows, always ≥ the true count
    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_partkey"), F.col("l_partkey").cast("string").alias("key")
    )
    counters = cms_counters(src, F.col("key"))
    keys = src.groupBy("l_partkey", "key").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    est = cms_estimates(keys, counters, F.col("key"), "l_partkey")
    return (
        keys.join(est, "l_partkey")
        .select(
            "l_partkey",
            F.col("est"),
            F.col("true_cnt").cast("int").alias("true_cnt"),
            (F.col("est") - F.col("true_cnt")).cast("int").alias("overcount"),
        )
    )


def q_tp7_length_buckets(spark, sf_dir):
    # power-of-two token-length histogram (batch/packing design aid);
    # bucket index from the binary-representation length — pure
    # integer math, no log2 floats at bucket boundaries
    docs = load_table(spark, sf_dir, "documents")
    n = token_count(F.col("text"))
    bucketed = docs.select(
        F.length(F.bin(n)).cast("int").alias("bucket"), n.alias("n_tokens")
    )
    g = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("int").alias("sum_tokens"),
    )
    return g.select(
        "bucket",
        F.expr("shiftleft(1, bucket - 1)").cast("int").alias("lo"),
        F.expr("shiftleft(1, bucket) - 1").cast("int").alias("hi"),
        "n_docs",
        "sum_tokens",
    )


def q_map1_props_map(spark, sf_dir):
    # JSON props as a typed map column: from_json → explode entries →
    # per-(key, value) aggregation
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    pairs = ev.select(F.explode(m).alias("key", "value"))
    return pairs.groupBy("key", "value").agg(
        F.count(F.lit(1)).cast("int").alias("n")
    )


def q_wa7_semi_join(spark, sf_dir):
    # left-semi: orders with at least one returned lineitem — the
    # EXISTS shape; semi-join never duplicates the left side
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R")
    return orders.join(
        returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("totalprice"),
    )


def q_cdc1_upsert_merge(spark, sf_dir):
    # changelog → current-state fold (latest-wins upsert + delete
    # tombstones): the reference's in-place UPDATE / ON CONFLICT
    # maintenance lifted to a single max_by aggregation — map-side
    # combinable, one shuffle, no per-key window over raw history
    from enriched_crime_incident_data_pipeline_spark.operators.cdc import (
        latest_state,
    )

    ev = load_table(spark, sf_dir, "events")
    state = latest_state(
        ev,
        key_cols=["user_id"],
        version_cols=["ts", "event_id"],
        payload_cols=["event_type", "value"],
        is_delete=F.col("event_type") == "error",
    )
    return state.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        "n_changes",
    )


def q_ts3_interval_merge(spark, sf_dir):
    # gaps-and-islands: coalesce overlapping per-user activity
    # intervals [ts, ts+30min) and measure covered time — exact
    # integer-microsecond arithmetic, one hash shuffle by user
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        coalesce_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1800000000).cast("long")).alias("e"),
    )
    return coalesce_intervals(iv, ["user_id"], "s", "e")


def q_ts4_cumulative_distinct(spark, sf_dir):
    # running distinct users per day, re-founded as first-seen
    # aggregation; the ordered window runs over the day relation only
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        cumulative_distinct_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    return cumulative_distinct_daily(ev, "user_id", "ts")


def q_seq1_transitions(spark, sf_dir):
    # event-type transition matrix: lag over (user, time) order, then
    # pair counts — the Markov-chain / user-journey building block
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    return pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_seq2_cooccurrence(spark, sf_dir):
    # market-basket pair co-occurrence: parts ordered together.  The
    # self-join key is the order id, so fan-out is bounded by max
    # basket size (≤7 lines) — pairs-per-order is O(1), never a
    # cross join; top-k by a deterministic (count, p1, p2) order
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
    )
    counts = pairs.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return counts.orderBy(F.desc("n_orders"), "p1", "p2").limit(50)


def q_dq1_constraint_audit(spark, sf_dir):
    # data-quality audit: the constraint surface a schemaless lake
    # loses vs the reference's Postgres DDL (PK uniqueness, NOT NULL,
    # FK integrity, CHECK ranges — src/db/schema.py:10-26) recast as
    # violation-count queries.  Each check is a pruned single-purpose
    # scan (pushdown filter + column pruning); the FK checks are hash
    # joins on the key
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def named(name, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    pk_dup = named(
        "orders_pk_dup",
        orders.agg(
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
                "violations"
            )
        ),
    )
    null_cust = named(
        "orders_null_cust",
        orders.filter(F.col("o_custkey").isNull()).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    qty_range = named(
        "li_qty_range",
        li.filter(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    disc_range = named(
        "li_discount_range",
        li.filter(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    orphan = named(
        "li_orphan",
        li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    ship_before = named(
        "li_ship_before_order",
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.to_date("l_shipdate") < F.to_date("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    return (
        pk_dup.unionByName(null_cust)
        .unionByName(qty_range)
        .unionByName(disc_range)
        .unionByName(orphan)
        .unionByName(ship_before)
    )


def q_ss4_hyperplane_lsh(spark, sf_dir):
    # signed-random-projection LSH over embeddings: md5-derived ±1
    # hyperplanes on floor-quantized integer components — an
    # engine-exact 16-bit bucket signature; map-only except the
    # bucket-size count
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        hyperplane_signatures,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_signatures(emb, n_planes=16, dim=64)


def q_ss5_lsh_near_dup(spark, sf_dir):
    # banded LSH over the hyperplane signatures: candidate pairs share
    # a band (equi-join on small ints), verified by bit_count Hamming —
    # the end of the embedding near-dup scale path (never an n² join)
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        hyperplane_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_near_dup_pairs(
        emb, n_planes=16, dim=64, band_bits=8, max_hamming=4
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


def q_attr1_last_touch(spark, sf_dir):
    # last-touch attribution: each purchase credits the user's most
    # recent STRICTLY-preceding click — a per-key as-of lookup as one
    # ignorenulls window (single hash shuffle by user; latency in
    # exact integer microseconds)
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_us = F.when(
        F.col("event_type") == "click", F.unix_micros("ts")
    )
    attributed = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("_us"),
        F.last(click_id, ignorenulls=True).over(w).alias("click_id"),
        F.last(click_us, ignorenulls=True).over(w).alias("_click_us"),
    )
    return attributed.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "click_id",
        (F.col("_us") - F.col("_click_us")).alias("latency_us"),
    )


def q_dq2_profile(spark, sf_dir):
    # single-pass column profiling (null + exact distinct counts per
    # column): the multi-distinct aggregate plans as ONE expand +
    # aggregate — one shuffle for the whole profile, not one per column
    orders = load_table(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nn{i}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd{i}"))
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn{i}, nd{i}" for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args})"
        " as (column_name, n_nulls, n_distinct)"
    )


def q_hist2_equidepth(spark, sf_dir):
    # equi-depth (decile) histogram WITHOUT a global sort: exact
    # percentile boundaries (1 row) broadcast back; bucket assignment
    # is a map-only fold over the boundary array
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("bs")
    )
    joined = li.select("l_extendedprice").crossJoin(F.broadcast(bounds))
    bucket = F.aggregate(
        F.col("bs"),
        F.lit(0),
        lambda acc, x: acc
        + F.when(F.col("l_extendedprice") > x, 1).otherwise(0),
    )
    return (
        joined.select(bucket.alias("bucket"), "l_extendedprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


MIXTURE_TARGETS_BP = {"src0": 6000, "src1": 3000, "src2": 1000}


def q_tp9_mixture_sample(spark, sf_dir):
    # training-data mixture: the largest sample matching a target
    # source composition (60/30/10), sized by integer math in-engine;
    # per-source keepers are the lowest-md5 docs — deterministic
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, MIXTURE_TARGETS_BP)



def q_tp12_temperature_sample(spark, sf_dir):
    # T=2 temperature mixture: per-stratum keep rate sqrt(n_min/n_s)
    # via hash threshold — expected composition ∝ sqrt(n_s), smallest
    # stratum kept whole; selection is a pure function of doc ids.
    # The testdata's sources are uniform, so strata are derived
    # 60/30/10 skewed (the realistic shape temperature sampling
    # exists to flatten).
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        temperature_sample,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "stratum",
        F.when(F.col("doc_id") % 10 < 6, "heavy")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("light"),
    )
    return temperature_sample(docs, stratum_col="stratum")



def q_ret1_bm25_topk(spark, sf_dir):
    # retrieval baseline: rational-idf BM25 (log-free for cross-engine
    # bit parity, same trade as ta11's rational perplexity) over the
    # corpus' 3 most frequent tokens; df/dl are map-side groupBys,
    # terms broadcast, per-doc fold order-pinned, top-k TakeOrdered
    from enriched_crime_incident_data_pipeline_spark.datapipe.retrieval import (
        bm25_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, n_terms=3, k=20)



def q_ret2_hybrid_rrf(spark, sf_dir):
    # hybrid retrieval: Reciprocal Rank Fusion of the BM25 lexical
    # top-20 (ret1) and the dense ANN top-20 (ss1) for the same item
    # space — the standard sparse+dense fusion. RRF works on RANKS
    # (1/(60+rank): one correctly-rounded IEEE divide per list, sum
    # in fixed text+vec order), so the two scoring scales never mix
    # and the fusion is bit-reproducible cross-engine. Both input
    # rank windows run over <= 20 survivor rows; fusion is a full
    # outer join of two tiny relations; final top-10 is TakeOrdered.
    from enriched_crime_incident_data_pipeline_spark.datapipe.retrieval import (
        bm25_topk,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        brute_force_neighbors,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    text = bm25_topk(docs, n_terms=3, k=20)
    text_r = text.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("text_rank"),
    )
    vec_r = brute_force_neighbors(emb, query_vec_id=0, k=20).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    # fusion as AGGREGATION, not a join: each list emits (doc,
    # contribution) rows, union, one groupBy. A full-outer join would
    # force a SortMergeJoin (Spark can't broadcast full-outer); the
    # union+agg shape is join-free, map-side combinable, and extends
    # to N lists unchanged. Bit-parity note: a doc has <= 2
    # contribution rows and IEEE addition is COMMUTATIVE (only
    # associativity fails), so the aggregated sum equals the oracle's
    # fixed text+vec order exactly.
    t_contrib = text_r.select(
        "doc_id",
        F.col("text_rank"),
        F.lit(None).cast("int").alias("vec_rank"),
        (F.lit(1.0) / (F.lit(60) + F.col("text_rank"))).alias("_c"),
    )
    v_contrib = vec_r.select(
        "doc_id",
        F.lit(None).cast("int").alias("text_rank"),
        F.col("vec_rank"),
        (F.lit(1.0) / (F.lit(60) + F.col("vec_rank"))).alias("_c"),
    )
    return (
        t_contrib.unionByName(v_contrib)
        .groupBy("doc_id")
        .agg(
            F.max("text_rank").alias("text_rank"),
            F.max("vec_rank").alias("vec_rank"),
            F.sum("_c").alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


def q_tp14_domain_upsample(spark, sf_dir):
    # deterministic upsampling WITH replacement — the mixture move
    # downsampling can't express: src0 repeats 2.5× in expectation
    # (2 copies + a 3rd iff the salted hash falls under the 5000 bp
    # fraction), src1 1.2×, src2 passes at 1×. Map-only
    # explode(sequence), no RNG, no shuffle; copy_idx is the clone's
    # stable identity for downstream shard shuffling.
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        domain_upsample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return domain_upsample(docs, {"src0": 25000, "src1": 12000})


def q_tp13_epoch_reshuffle(spark, sf_dir):
    # multi-epoch training order without materialization: every
    # (epoch, doc) gets a stable (shard, position) from an
    # epoch-salted hash — 3 independent permutations from one pass;
    # the per-(epoch, shard) rank window parallelizes across
    # epochs x shards
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        hash32,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = docs.select(
        "doc_id", F.explode(F.array(*[F.lit(e) for e in range(3)])).alias("epoch")
    )
    h = hash32(
        F.concat(
            F.lit("epoch"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    w = Window.partitionBy("epoch", "shard").orderBy("_h", "doc_id")
    return (
        epochs.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(8)).cast("int"))
        .withColumn("position", F.row_number().over(w))
        .select("epoch", "doc_id", "shard", "position")
    )


def q_ta10_oov_rate(spark, sf_dir):
    # out-of-vocabulary rate per document against the corpus' own
    # top-1000-document-frequency vocabulary — the tokenizer-coverage
    # signal; vocab is a broadcast anti-join, rate is integer bp
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    dfreq = (
        tok.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    vocab = dfreq.orderBy(F.desc("df"), "tok").limit(1000).select("tok")
    cnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nt"))
    oov = (
        tok.join(F.broadcast(vocab), "tok", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_noov"))
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .join(oov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_nt", F.lit(0)).alias("n_tokens"),
            F.when(F.coalesce("_nt", F.lit(0)) == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("(coalesce(_noov, 0) * 10000) DIV _nt")
            )
            .alias("oov_bp"),
        )
    )


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — generated alongside, same constants
# ---------------------------------------------------------------------------

# hyperplane-LSH signature pipeline (mirrors
# datapipe/similarity.py:hyperplane_signatures — same md5 Rademacher
# planes, same floor(x·10⁶) quantization)
_HYPERPLANE_SIGS_CTE = """comp AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS d,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS qx
              FROM embeddings
            ),
            proj AS (
              SELECT c.vec_id, p.j,
                     sum(c.qx * (CASE WHEN
                       ('0x' || substr(md5('hp' || p.j || ':' || c.d), 1, 8))::BIGINT
                       % 2 = 0 THEN 1 ELSE -1 END)) AS s
              FROM comp c
              CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) p
              GROUP BY 1, 2
            ),
            sigs AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << j)
                              ELSE 0 END) AS BIGINT) AS sig
              FROM proj GROUP BY vec_id
            )"""

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKENS = f"string_split_regex({_NORM}, ' +')"

_TOKEN_COUNT = f"CASE WHEN {_NORM} = '' THEN 0 ELSE len({_TOKENS}) END"
_HASH32 = "('0x' || substr(md5({x}), 1, 8))::BIGINT"

# bloom/cms coordinate generators (mirror datapipe/sketch.py)
_BLOOM_POS = "\n              UNION ALL ".join(
    f"SELECT doc_id, ('0x' || substr(md5('bloom{j}:' || f), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
# dc7: Bloom positions keyed by gram (build side) and by (doc_id,
# gram) (probe side) — same md5 basis as _BLOOM_POS.
_BLOOM_GPOS = "\n              UNION ALL ".join(
    f"SELECT ('0x' || substr(md5('bloom{j}:' || gram), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
_BLOOM_GPOS_DOC = "\n              UNION ALL ".join(
    f"SELECT doc_id, gram,"
    f" ('0x' || substr(md5('bloom{j}:' || gram), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
# dc7 / st17 share one oracle: the streaming probe is the identical
# stateless computation over the identical split (batch ≡ stream)
_DC7_BLOOM_SQL = f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
            bits AS (
              SELECT DISTINCT bit FROM ({_BLOOM_GPOS.format(src="ev")})
            ),
            gp AS ({_BLOOM_GPOS_DOC.format(src="g WHERE doc_id % 50 <> 0")}),
            ghit AS (
              SELECT gp.doc_id, gp.gram
              FROM gp LEFT JOIN bits b ON gp.bit = b.bit
              GROUP BY gp.doc_id, gp.gram
              HAVING sum(CASE WHEN b.bit IS NULL THEN 1 ELSE 0 END) = 0
            ),
            hit AS (SELECT DISTINCT doc_id FROM ghit)
            SELECT d.doc_id,
                   CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN hit h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        """

_CMS_POS = "\n              UNION ALL ".join(
    f"SELECT l_partkey, {j} AS j,"
    f" ('0x' || substr(md5('cms{j}:' || {{keyexpr}}), 1, 8))::BIGINT"
    f" % {CMS_W} AS bucket FROM {{src}}"
    for j in range(CMS_D)
)

_SHINGLES3 = f"""
    SELECT doc_id, DISTINCT_SH.shingle FROM (
      SELECT doc_id, toks FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    ) t,
    LATERAL (
      SELECT DISTINCT array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
      FROM unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
    ) DISTINCT_SH
"""

_MINHASH_TERMS = ",\n".join(
    f"      min(({MINHASH_A[j]} * x + {MINHASH_B[j]}) % {MINHASH_PRIME}) AS mh{j}"
    for j in range(NUM_HASHES)
)
_BAND_TERMS = ", ".join(
    f"({b}, md5("
    + " || '-' || ".join(
        f"CAST(mh{b * BAND_SIZE + r} AS VARCHAR)" for r in range(BAND_SIZE)
    )
    + "))"
    for b in range(NUM_HASHES // BAND_SIZE)
)

_MINHASH_BANDS_SQL = f"""
WITH sh AS ({_SHINGLES3}),
hx AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
sig AS (
  SELECT doc_id,
{_MINHASH_TERMS}
  FROM hx GROUP BY doc_id
)
SELECT doc_id, b.band_id, b.band_hash
FROM sig, LATERAL (
  SELECT * FROM (VALUES {_BAND_TERMS}) AS v(band_id, band_hash)
) b
"""

# 64-bit simhash: bit i<32 from the first md5 word (h1), else the
# second (h2); bit 63 is the signed-long minimum (two's complement)
_SIMHASH_SUM_TERMS = ",\n".join(
    f"      sum(CASE WHEN ({'h1' if i < 32 else 'h2'} & {1 << (i % 32)}) <> 0"
    f" THEN 1 ELSE -1 END) AS s{i}"
    for i in range(64)
)
_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN "
    + ("(-9223372036854775807 - 1)" if i == 63 else str(1 << i))
    + " ELSE 0 END)"
    for i in range(64)
)

_STOPWORD_SETS = {
    code: "[" + ", ".join(f"'{w}'" for w in STOPWORDS[code]) + "]"
    for code in STOPWORDS
}
_LANG_SCORES = ",\n".join(
    f"      len(list_filter({_TOKENS}, t -> list_contains({_STOPWORD_SETS[code]}, t))) AS sc_{code}"
    for code in sorted(STOPWORDS)
)
_LANG_BEST = "greatest(" + ", ".join(f"sc_{c}" for c in sorted(STOPWORDS)) + ")"
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN sc_{c} = {_LANG_BEST} AND {_LANG_BEST} > 0 THEN '{c}'"
        for c in sorted(STOPWORDS)
    )
    + " ELSE 'und' END"
)

_TA11_SQL = f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS ts FROM documents),
            tok AS (
              SELECT doc_id, unnest(ts) AS tok,
                     unnest(range(len(ts))) AS pos
              FROM toks
            ),
            counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v
              FROM counts
            ),
            per AS (
              SELECT t.doc_id, t.pos,
                     CAST(tot.n_total + tot.v AS DOUBLE)
                       / CAST(co.c + 1 AS DOUBLE) AS ip
              FROM tok t JOIN counts co ON t.tok = co.tok, tot
            ),
            agg AS (
              SELECT doc_id, sum(ip ORDER BY pos) AS sum_ip,
                     count(*) AS n FROM per GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   sum_ip / CAST(n AS DOUBLE) AS mean_inv_prob
            FROM agg
"""

# gr1: 5 unrolled damped PageRank rounds over the near-dup citation
# graph (edges newer -> older doc). Every double op mirrors the Spark
# operator's ordered-fold mode: od is an exact integer-valued double,
# contributions fold in src order, the damping literals parse to the
# same binary64 on both engines.
_GR1_ITER = """,
            s{k} AS (
              SELECT e.dst, sum(r.pr / d.od ORDER BY e.src) AS s
              FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r{p} r ON e.src = r.id
              GROUP BY e.dst
            ),
            r{k} AS (
              SELECT n.id,
                     CAST(0.15 AS DOUBLE)
                       + CAST(0.85 AS DOUBLE)
                         * coalesce(s.s, CAST(0.0 AS DOUBLE)) AS pr
              FROM nodes n LEFT JOIN s{k} s ON n.id = s.dst
            )"""

_GR1_PAGERANK_SQL = (
    f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (SELECT b AS src, a AS dst FROM pairs),
            deg AS (
              SELECT src, CAST(count(*) AS DOUBLE) AS od
              FROM edges GROUP BY src
            ),
            nodes AS (SELECT doc_id AS id FROM documents),
            r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""
    + "".join(_GR1_ITER.format(k=k, p=k - 1) for k in range(1, 6))
    + """
            SELECT id AS doc_id, pr FROM r5
"""
)

# gr2: PageRank over the DIV-16 ancestry DAG, 8 unrolled rounds.
# The Spark side exits at the bit-exact fixpoint (depth+1 rounds);
# on a DAG the remaining unrolled rounds are identity, so r8 == the
# early-exited iterate bit-for-bit.
_GR2_SQL = (
    """
            WITH edges AS (
              SELECT doc_id AS src, doc_id // 16 AS dst
              FROM documents WHERE doc_id >= 1
            ),
            deg AS (
              SELECT src, CAST(count(*) AS DOUBLE) AS od
              FROM edges GROUP BY src
            ),
            nodes AS (SELECT doc_id AS id FROM documents),
            r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""
    + "".join(_GR1_ITER.format(k=k, p=k - 1) for k in range(1, 9))
    + """
            SELECT id AS doc_id, pr FROM r8
"""
)

# gr3: HITS, 4 unrolled integer rounds over the LSH citation graph.
# No normalization → every score is an exact integer sum, so plain
# unordered SUM matches Spark bit-for-bit by associativity. DuckDB
# sums BIGINT into HUGEINT — cast back at each step.
_GR3_HALF = """,
            a{k} AS (
              SELECT e.dst AS id, CAST(sum(h.s) AS BIGINT) AS s
              FROM edges e JOIN h{p} h ON e.src = h.id GROUP BY e.dst
            ),
            h{k} AS (
              SELECT e.src AS id, CAST(sum(a.s) AS BIGINT) AS s
              FROM edges e JOIN a{k} a ON e.dst = a.id GROUP BY e.src
            )"""

_GR3_HITS_SQL = (
    f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (SELECT b AS src, a AS dst FROM pairs),
            nodes AS (SELECT doc_id AS id FROM documents),
            h0 AS (SELECT id, CAST(1 AS BIGINT) AS s FROM nodes)"""
    + "".join(_GR3_HALF.format(k=k, p=k - 1) for k in range(1, 5))
    + """
            SELECT n.id AS doc_id,
                   CAST(coalesce(a4.s, 0) AS BIGINT) AS authority,
                   CAST(coalesce(h4.s, 0) AS BIGINT) AS hub
            FROM nodes n
            LEFT JOIN a4 ON n.id = a4.id
            LEFT JOIN h4 ON n.id = h4.id
"""
)

# tok1: BPE merge learning, 3 unrolled training rounds. The greedy
# left-to-right re-segmentation is the same sequential string fold as
# datapipe/bpe.py (list_reduce == Spark aggregate, element order
# pinned by the list itself); the winning pair per round is the
# deterministic (count desc, pair asc) argmin over the pair-count
# relation, so both engines learn the identical merge table.
_TOK1_PAIRS = """
              SELECT arr[i] AS a, arr[i + 1] AS b, count(*) AS c
              FROM {src}, unnest(generate_series(1, len(arr) - 1)) AS s(i)
              GROUP BY 1, 2
"""
_TOK1_APPLY = """string_split(list_reduce(list_prepend('', arr),
                (acc, v) -> CASE
                  WHEN acc = '' THEN v
                  WHEN v = mb AND acc = ma
                    THEN ma || chr(31) || mb
                  WHEN v = mb AND right(acc, length(ma) + 1) = ' ' || ma
                    THEN substr(acc, 1, length(acc) - length(ma))
                         || ma || chr(31) || mb
                  ELSE acc || ' ' || v END), ' ')"""

_TOK_CHAIN_SQL = (
    f"""t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            pc1 AS ({_TOK1_PAIRS.format(src='t1')}),
            m1 AS (SELECT a AS ma, b AS mb, c FROM pc1
                   ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            t{k} AS (SELECT doc_id, {_TOK1_APPLY} AS arr
                     FROM t{k - 1}, m{k - 1}),
            pc{k} AS ({_TOK1_PAIRS.format(src=f't{k}')}),
            m{k} AS (SELECT a AS ma, b AS mb, c FROM pc{k}
                     ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
)

_TOK1_BPE_SQL = (
    "\n            WITH "
    + _TOK_CHAIN_SQL
    + """
            SELECT it, ma AS a, mb AS b, CAST(c AS BIGINT) AS cnt FROM (
              SELECT 1 AS it, ma, mb, c FROM m1
              UNION ALL SELECT 2, ma, mb, c FROM m2
              UNION ALL SELECT 3, ma, mb, c FROM m3
            )
"""
)

# tok3: WordPiece greedy longest-match, same semantics as
# datapipe/wordpiece.py but a deliberately different fold shape:
# DuckDB 1.0.0's list_reduce mis-binds values across rows when the
# accumulator is a STRUCT and rows' lists have different lengths
# (verified by minimal repro — row 2's fold reads row 1's elements),
# while VARCHAR-accumulator folds (the tok1 shape) are correct. The
# greedy choice at a position doesn't depend on the accumulator, so
# the pick per position precomputes in list_transform (safe), and
# the fold only walks the skip counts: acc = '<skip>|<fp>'.
_TOK3_PICKS = """list_transform(generate_series(1, length(w)),
      p -> CASE
        WHEN length(substr(w, CAST(p AS INT), 3)) = 3
             AND list_contains(vocab, substr(w, CAST(p AS INT), 3))
          THEN substr(w, CAST(p AS INT), 3)
        WHEN length(substr(w, CAST(p AS INT), 2)) = 2
             AND list_contains(vocab, substr(w, CAST(p AS INT), 2))
          THEN substr(w, CAST(p AS INT), 2)
        ELSE substr(w, CAST(p AS INT), 1) END)"""

_TOK3_FOLD = """split_part(list_reduce(
  list_prepend('0|', picks),
  (acc, x) -> CASE
    WHEN CAST(split_part(acc, '|', 1) AS BIGINT) > 0
      THEN CAST(CAST(split_part(acc, '|', 1) AS BIGINT) - 1 AS VARCHAR)
           || '|' || split_part(acc, '|', 2)
    ELSE CAST(length(x) - 1 AS VARCHAR) || '|'
         || split_part(acc, '|', 2) || ' ' || x
  END), '|', 2)"""

_TOK3_WORDPIECE_SQL = f"""
            WITH t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            words AS (
              SELECT doc_id, pos, arr[pos] AS w
              FROM t1, unnest(generate_series(1, len(arr))) AS s(pos)
              WHERE length(arr[pos]) >= 1
            ),
            singles AS (
              SELECT DISTINCT substr(w, CAST(p AS INT), 1) AS piece
              FROM words, unnest(generate_series(1, length(w))) AS q(p)
            ),
            multi AS (
              SELECT piece FROM (
                SELECT piece, count(*) AS c FROM (
                  SELECT substr(w, CAST(p AS INT), 2) AS piece
                  FROM words, unnest(generate_series(1, length(w))) AS q(p)
                  WHERE length(substr(w, CAST(p AS INT), 2)) = 2
                  UNION ALL
                  SELECT substr(w, CAST(p AS INT), 3)
                  FROM words, unnest(generate_series(1, length(w))) AS q(p)
                  WHERE length(substr(w, CAST(p AS INT), 3)) = 3
                ) GROUP BY piece
              ) ORDER BY c DESC, piece LIMIT 40
            ),
            v AS (
              SELECT list_sort(list(piece)) AS vocab FROM (
                SELECT piece FROM singles UNION SELECT piece FROM multi
              )
            ),
            pkd AS (
              SELECT doc_id, pos, {_TOK3_PICKS} AS picks
              FROM words, v
            ),
            enc AS (
              SELECT doc_id, pos, {_TOK3_FOLD} AS fp
              FROM pkd
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(len(string_split(fp, ' ')) - 1) AS BIGINT)
                     AS n_pieces,
                   md5(string_agg(fp, '|' ORDER BY pos)) AS fp
            FROM enc GROUP BY doc_id
"""

_TOK2_BPE_SQL = (
    "\n            WITH "
    + _TOK_CHAIN_SQL
    + f""",
            t4 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM t3, m3)
            SELECT t1.doc_id, CAST(len(t1.arr) AS BIGINT) AS n_raw,
                   CAST(len(t4.arr) AS BIGINT) AS n_bpe
            FROM t1 JOIN t4 ON t1.doc_id = t4.doc_id
"""
)

# tok4: sampled-corpus BPE training — merges m1..m3 learned from the
# deterministic md5-hash half (the same _HASH32 split as tp2), then
# the FULL corpus encoded once with the learned table. Same greedy
# fold as tok1/tok2; only the training relation changes.
_TOK4_SAMPLED_SQL = (
    f"""
            WITH s1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents
                        WHERE ({_HASH32.format(x="'bpe:' || doc_id")}
                               % 10000) < 5000),
            pc1 AS ({_TOK1_PAIRS.format(src='s1')}),
            m1 AS (SELECT a AS ma, b AS mb, c FROM pc1
                   ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            s{k} AS (SELECT doc_id, {_TOK1_APPLY} AS arr
                     FROM s{k - 1}, m{k - 1}),
            pc{k} AS ({_TOK1_PAIRS.format(src=f's{k}')}),
            m{k} AS (SELECT a AS ma, b AS mb, c FROM pc{k}
                     ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
    + f""",
            t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            f1 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM t1, m1),
            f2 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM f1, m2),
            f3 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM f2, m3)
            SELECT t1.doc_id, CAST(len(t1.arr) AS BIGINT) AS n_raw,
                   CAST(len(f3.arr) AS BIGINT) AS n_bpe
            FROM t1 JOIN f3 ON t1.doc_id = f3.doc_id
"""
)

# tok5/tok6: classic CHARACTER-level BPE trained on the word
# histogram (frequency-weighted pair counts over distinct words —
# the Sennrich reduction; datapipe/bpe.py `learn_bpe_merges_chars`).
# Same greedy _TOK1_APPLY fold, but symbols are characters and every
# pc{k} weights by the word's corpus frequency.
_TOK5_CHARS = (
    "list_transform(generate_series(1, length(w)),"
    " p -> substr(w, CAST(p AS INT), 1))"
)
_TOK5_PAIRS = """
              SELECT arr[i] AS a, arr[i + 1] AS b, SUM(freq) AS c
              FROM {src}, unnest(generate_series(1, len(arr) - 1)) AS s(i)
              GROUP BY 1, 2
"""
_TOK5_CHAIN = (
    f"""wh AS (
              SELECT arr[i] AS w, count(*) AS freq
              FROM (SELECT {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(i)
              WHERE length(arr[i]) >= 1
              GROUP BY 1
            ),
            c1 AS (SELECT w, freq, {_TOK5_CHARS} AS arr FROM wh),
            wc1 AS ({_TOK5_PAIRS.format(src='c1')}),
            wm1 AS (SELECT a AS ma, b AS mb, c FROM wc1
                    ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            c{k} AS (SELECT w, freq, {_TOK1_APPLY} AS arr
                     FROM c{k - 1}, wm{k - 1}),
            wc{k} AS ({_TOK5_PAIRS.format(src=f'c{k}')}),
            wm{k} AS (SELECT a AS ma, b AS mb, c FROM wc{k}
                      ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
)

_TOK5_CHAR_MERGES_SQL = (
    "\n            WITH "
    + _TOK5_CHAIN
    + """
            SELECT it, ma AS a, mb AS b, CAST(c AS BIGINT) AS cnt FROM (
              SELECT 1 AS it, ma, mb, c FROM wm1
              UNION ALL SELECT 2, ma, mb, c FROM wm2
              UNION ALL SELECT 3, ma, mb, c FROM wm3
            )
"""
)

_TOK6_CHAR_ENCODE_SQL = (
    "\n            WITH "
    + _TOK5_CHAIN
    + f""",
            c4 AS (SELECT w, freq, {_TOK1_APPLY} AS arr FROM c3, wm3),
            wp AS (SELECT w, len(arr) AS np FROM c4),
            dw AS (
              SELECT doc_id, arr[i] AS w
              FROM (SELECT doc_id, {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(i)
              WHERE length(arr[i]) >= 1
            )
            SELECT doc_id,
                   count(*) AS n_words,
                   CAST(SUM(length(w)) AS BIGINT) AS n_chars,
                   CAST(SUM(np) AS BIGINT) AS n_bpe
            FROM dw JOIN wp USING (w)
            GROUP BY doc_id
"""
)

_DOT = "list_dot_product(a.v, b.v)"
_COS = f"{_DOT} / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

_SESSIONIZATION_SQL = """
    SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
      SELECT user_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) GROUP BY user_id
"""

_TUMBLING_SQL = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
"""


_S5_PARSE_SQL = """
            WITH fields AS (
              SELECT doc_id,
                     printf('%d/%d/2024 %d:%02d', doc_id % 12 + 1,
                            doc_id % 28 + 1, doc_id % 24, doc_id % 60) AS dt,
                     printf('2024-%05d', doc_id) AS inc,
                     printf('BLK %d MAIN ST', doc_id % 50 * 100) AS loca,
                     printf(' APT %d', doc_id % 20) AS locb,
                     ['THEFT','FRAUD','EMS','ERROR','PATROL'][
                       CAST(doc_id % 5 + 1 AS INTEGER)] AS nat,
                     CASE WHEN doc_id % 5 = 2 THEN 'EMSSTAT'
                          ELSE 'OK0109973' END AS ori
              FROM documents
            ),
            data AS (
              SELECT 'reports/daily.pdf' AS path,
                     CAST(floor(doc_id / 10) AS BIGINT) AS page_number,
                     CAST(doc_id % 10
                          + CASE WHEN doc_id < 10 THEN 1 ELSE 0 END
                          AS BIGINT) AS block_idx,
                     (CASE WHEN doc_id % 7 = 3
                           THEN concat_ws(chr(10), dt, inc, ori)
                           WHEN doc_id % 7 = 5
                           THEN concat_ws(chr(10), dt, inc, loca, locb, nat, ori)
                           ELSE concat_ws(chr(10), dt, inc, loca, nat, ori)
                      END) || chr(10) AS block_text
              FROM fields
            ),
            mx AS (SELECT max(doc_id) AS max_id FROM documents),
            extras AS (
              SELECT 'reports/daily.pdf' AS path, CAST(0 AS BIGINT) AS page_number,
                     CAST(0 AS BIGINT) AS block_idx,
                     'NORMAN POLICE DEPARTMENT' || chr(10) ||
                     'Daily Incident Summary (Public)' || chr(10) AS block_text
              UNION ALL
              SELECT 'reports/daily.pdf', 0, 11, 'Report Generated' || chr(10)
              UNION ALL
              SELECT 'reports/daily.pdf', 0, 12, 'Page 1' || chr(10)
              UNION ALL
              SELECT 'reports/daily.pdf', CAST(floor(max_id / 10) AS BIGINT),
                     CAST(max_id % 10 + 1 AS BIGINT), 'End of Report' || chr(10)
              FROM mx
            ),
            blocks AS (
              SELECT * FROM data UNION ALL SELECT * FROM extras
            ),
            sized AS (
              SELECT b.*,
                     count(*) OVER (PARTITION BY path, page_number) AS nb,
                     max(page_number) OVER (PARTITION BY path) AS lastp
              FROM blocks b
            ),
            kept AS (
              SELECT path, page_number, block_idx,
                     string_split(block_text, chr(10)) AS ls
              FROM sized
              WHERE CASE
                WHEN page_number = 0
                  THEN block_idx >= 1 AND block_idx <= nb - 3
                WHEN page_number = lastp THEN block_idx <= nb - 2
                ELSE TRUE END
            ),
            removed AS (
              SELECT path, page_number, block_idx,
                     CASE WHEN COALESCE(list_position(ls, ''), 0) > 0
                          THEN list_slice(ls, 1, list_position(ls, '') - 1)
                               || list_slice(ls, list_position(ls, '') + 1,
                                             len(ls))
                          ELSE ls END AS t
              FROM kept
            ),
            norm AS (
              SELECT path, page_number, block_idx,
                     CASE WHEN len(t) < 5
                          THEN list_slice(t, 1, 2) || [' ', ' ']
                               || list_slice(t, 3, len(t))
                          WHEN len(t) > 5
                          THEN list_slice(t, 1, 2) || [t[3] || t[4]]
                               || list_slice(t, 5, len(t))
                          ELSE t END AS v
              FROM removed
            )
            SELECT path, page_number, block_idx,
                   v[1] AS datetime_str, v[2] AS incident_num,
                   v[3] AS location, v[4] AS nature, v[5] AS incident_ori
            FROM norm
        """


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


# DuckDB twin of sinks.zorder.morton_code(bits=7): bit i of px lands
# at 2i, bit i of py at 2i+1 — generated once so both engines share
# the identical interleave
_MORTON7_SQL = " + ".join(
    f"(((px >> {i}) & 1) << {2 * i}) + (((py >> {i}) & 1) << {2 * i + 1})"
    for i in range(7)
)


def oracle_queries() -> dict[str, str]:
    return {
        "flagship_enriched_report": _FLAGSHIP_SQL,
        "p1_projection": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem"
        ),
        "p2_star": "SELECT * FROM region",
        "p3_point_lookup": (
            "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 500"
        ),
        "p4_null_health": """
            SELECT count(*) AS total_rows,
                   count(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_l_quantity,
                   count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS null_l_returnflag
            FROM lineitem
        """,
        "p6_url_classify": f"SELECT * FROM ({_P6_CLASSIFIED}) WHERE report_kind IS NOT NULL",
        "s2_watermark_prune": f"""
            SELECT href, report_date FROM ({_P6_CLASSIFIED})
            WHERE report_kind = 'incident' AND report_date > DATE '1997-06-30'
        """,
        "j1_broadcast_join": """
            SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "j2_emsstat_selfjoin": f"""
            SELECT incident_num,
                   CAST(max(emsstat) OVER (PARTITION BY incident_ts, location)
                        AS INTEGER) AS emsstat
            FROM ({_DEDUPED})
        """,
        "j3_cache_antijoin": f"""
            WITH locdim AS ({_LOCDIM}),
            cache AS (SELECT loc FROM locdim WHERE latitude < 35.2226),
            locs AS (SELECT DISTINCT location AS loc FROM ({_DEDUPED}))
            SELECT loc FROM locs WHERE loc NOT IN (SELECT loc FROM cache)
        """,
        "j5_weather_joinback": f"""
            WITH locdim AS ({_LOCDIM}),
            coords AS (
              SELECT s.incident_num, s.incident_ts, d.latitude, d.longitude
              FROM ({_DEDUPED}) s LEFT JOIN locdim d ON s.location = d.loc
            ),
            wh AS (
              SELECT DISTINCT latitude, longitude,
                     CAST(incident_ts AS DATE) AS date, hour(incident_ts) AS hour,
                     CAST((day(CAST(incident_ts AS DATE)) * 24 + hour(incident_ts))
                          % 100 AS INTEGER) AS weather_code
              FROM coords WHERE latitude IS NOT NULL AND longitude IS NOT NULL
            )
            SELECT c.incident_num, w.weather_code AS weather
            FROM coords c LEFT JOIN wh w
              ON c.latitude = w.latitude AND c.longitude = w.longitude
             AND CAST(c.incident_ts AS DATE) = w.date
             AND hour(c.incident_ts) = w.hour
        """,
        "j7_anti_join": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            )
        """,
        "s6_idempotent_append": """
            SELECT o_orderkey FROM orders WHERE o_orderkey % 2 <> 0
        """,
        "a1_groupby_count": (
            "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY l_returnflag"
        ),
        "a3_watermark_max": (
            "SELECT max(CAST(o_orderdate AS DATE)) AS watermark FROM orders"
        ),
        "a4_global_count": "SELECT count(*) AS n FROM lineitem",
        "a6_distinct_single": "SELECT DISTINCT o_orderpriority FROM orders",
        "a7_distinct_multi": """
            SELECT DISTINCT c_nationkey, o_orderpriority
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "w1_frequency_rank": """
            SELECT o_orderpriority,
                   CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS freq_rank
            FROM orders GROUP BY o_orderpriority
        """,
        "j4_rank_joinback": """
            WITH r AS (
              SELECT l_returnflag,
                     CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS flag_rank
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, r.flag_rank
            FROM lineitem l LEFT JOIN r USING (l_returnflag)
        """,
        "w3_window_max": """
            SELECT event_id,
                   CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id, CAST(ts AS DATE))
                        AS INTEGER) AS any_error_that_day
            FROM events
        """,
        "f1_derivations": f"""
            SELECT incident_num, incident_ts, day_of_week, time_of_day, emsstat
            FROM ({_DEDUPED})
        """,
        "f5_date_format": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
            FROM orders
        """,
        "f13_side_of_town": f"""
            SELECT c_custkey, {_SIDE_EXPR} AS side_of_town FROM (
              SELECT c_custkey,
                     35.2226 + CAST(c_custkey % 21 - 10 AS DOUBLE) * 0.013 AS latitude,
                     -97.4395 + CAST(c_custkey % 17 - 8 AS DOUBLE) * 0.019 AS longitude
              FROM customer
            )
        """,
        "f15_element_at": """
            SELECT vec_id,
                   CASE WHEN CAST(vec_id * 7 % 80 AS INTEGER) < len(embedding)
                        THEN embedding[CAST(vec_id * 7 % 80 AS INTEGER) + 1]
                   END AS code
            FROM embeddings
        """,
        "topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
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
        "sort_limit": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        "pivot": """
            SELECT CAST(ts AS DATE) AS day,
                   count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                   count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
                   count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup
            FROM events GROUP BY 1
        """,
        "rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "cube": """
            SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "percentiles": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) AS p50,
                   quantile_cont(l_extendedprice, 0.95) AS p95
            FROM lineitem GROUP BY l_returnflag
        """,
        "set_ops": """
            SELECT c_custkey, 'no_orders' AS status FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              EXCEPT SELECT o_custkey FROM orders
            )
            UNION ALL
            SELECT c_custkey, 'has_orders' AS status FROM (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              INTERSECT SELECT o_custkey FROM orders
            )
        """,
        "cdc1_upsert_merge": """
            WITH ranked AS (
              SELECT user_id, event_type, value,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n_changes
              FROM events
            )
            SELECT user_id, event_type AS last_type, value AS last_value,
                   n_changes
            FROM ranked WHERE rn = 1 AND event_type <> 'error'
        """,
        "ts3_interval_merge": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + 1800000000 AS e
              FROM events
            ),
            flagged AS (
              SELECT user_id, s, e,
                CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
                     THEN 1 ELSE 0 END AS new_island
              FROM iv
              WINDOW w AS (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
            ),
            isl AS (
              SELECT user_id, s, e,
                sum(new_island) OVER (
                  PARTITION BY user_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS island
              FROM flagged
            ),
            islands AS (
              SELECT user_id, island, min(s) AS s0, max(e) AS e1
              FROM isl GROUP BY user_id, island
            )
            SELECT user_id, count(*) AS n_islands,
                   CAST(sum(e1 - s0) AS BIGINT) AS covered_us
            FROM islands GROUP BY user_id
        """,
        "ts4_cumulative_distinct": """
            WITH fs AS (
              SELECT user_id, min(CAST(ts AS DATE)) AS day
              FROM events GROUP BY user_id
            ),
            daily AS (
              SELECT day, count(*) AS new_entities FROM fs GROUP BY day
            )
            SELECT day, new_entities,
                   CAST(sum(new_entities) OVER (
                     ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cumulative_entities
            FROM daily
        """,
        "seq1_transitions": """
            WITH seqd AS (
              SELECT event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_type
              FROM events
            )
            SELECT prev_type, event_type AS next_type, count(*) AS n
            FROM seqd WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        """,
        "seq2_cooccurrence": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
            SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                   count(*) AS n_orders
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, p1, p2
            LIMIT 50
        """,
        "dq1_constraint_audit": """
            SELECT 'orders_pk_dup' AS check_name,
                   count(*) - count(DISTINCT o_orderkey) AS violations
            FROM orders
            UNION ALL
            SELECT 'orders_null_cust', count(*) FROM orders
            WHERE o_custkey IS NULL
            UNION ALL
            SELECT 'li_qty_range', count(*) FROM lineitem
            WHERE l_quantity < 1 OR l_quantity > 50
            UNION ALL
            SELECT 'li_discount_range', count(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1
            UNION ALL
            SELECT 'li_orphan', count(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
            UNION ALL
            SELECT 'li_ship_before_order', count(*)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE CAST(l_shipdate AS DATE) < CAST(o_orderdate AS DATE)
        """,
        "ss4_hyperplane_lsh": f"""
            WITH {_HYPERPLANE_SIGS_CTE}
            SELECT vec_id, sig,
                   count(*) OVER (PARTITION BY sig) AS bucket_size
            FROM sigs
        """,
        "ss5_lsh_near_dup": f"""
            WITH {_HYPERPLANE_SIGS_CTE},
            bands AS (
              SELECT vec_id, sig, 0 AS band_idx, sig & 255 AS band_val
              FROM sigs
              UNION ALL
              SELECT vec_id, sig, 1, (sig >> 8) & 255 FROM sigs
            )
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.vec_id < b.vec_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 4
        """,
        "tp9_mixture_sample": f"""
            WITH t(src, t_bp) AS (VALUES {", ".join(
                f"('{k}', {v})" for k, v in sorted(MIXTURE_TARGETS_BP.items())
            )}),
            counts AS (
              SELECT source AS src, count(*) AS n
              FROM documents WHERE source IN (SELECT src FROM t)
              GROUP BY source
            ),
            caps AS (
              SELECT src, t_bp, (n * 10000) // t_bp AS cap
              FROM counts JOIN t USING (src)
            ),
            tot AS (SELECT min(cap) AS T FROM caps),
            quota AS (
              SELECT src, (T * t_bp) // 10000 AS m
              FROM caps CROSS JOIN tot
            ),
            ranked AS (
              SELECT doc_id, source AS src,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY {_HASH32.format(
                           x="'mix:' || CAST(doc_id AS VARCHAR)")}, doc_id
                     ) AS rk
              FROM documents WHERE source IN (SELECT src FROM t)
            )
            SELECT doc_id, src AS source
            FROM ranked JOIN quota USING (src) WHERE rk <= m
        """,
        "ta10_oov_rate": f"""
            WITH tok AS (
              SELECT doc_id, t.tok
              FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents) d,
              LATERAL (SELECT unnest(toks) AS tok) t
              WHERE t.tok <> ''
            ),
            dfreq AS (
              SELECT tok, count(DISTINCT doc_id) AS df
              FROM tok GROUP BY tok
            ),
            vocab AS (
              SELECT tok FROM dfreq ORDER BY df DESC, tok LIMIT 1000
            ),
            cnt AS (
              SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id
            ),
            oov AS (
              SELECT doc_id, count(*) AS noov FROM tok
              WHERE tok NOT IN (SELECT tok FROM vocab)
              GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(nt, 0) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN coalesce(nt, 0) = 0 THEN 0
                        ELSE (coalesce(noov, 0) * 10000) // nt
                   END AS BIGINT) AS oov_bp
            FROM documents d
            LEFT JOIN cnt USING (doc_id)
            LEFT JOIN oov USING (doc_id)
        """,
        "attr1_last_touch": """
            WITH marked AS (
              SELECT user_id, event_id, event_type,
                     epoch_us(ts) AS us,
                     last_value(CASE WHEN event_type = 'click'
                                THEN event_id END IGNORE NULLS) OVER w
                       AS click_id,
                     last_value(CASE WHEN event_type = 'click'
                                THEN epoch_us(ts) END IGNORE NULLS) OVER w
                       AS click_us
              FROM events
              WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
            )
            SELECT user_id, event_id AS purchase_id, click_id,
                   us - click_us AS latency_us
            FROM marked WHERE event_type = 'purchase'
        """,
        "dq2_profile": """
            SELECT 'o_orderkey' AS column_name,
                   count(*) - count(o_orderkey) AS n_nulls,
                   count(DISTINCT o_orderkey) AS n_distinct FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*) - count(o_custkey),
                   count(DISTINCT o_custkey) FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
                   count(DISTINCT o_orderstatus) FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice) FROM orders
            UNION ALL
            SELECT 'o_orderdate', count(*) - count(o_orderdate),
                   count(DISTINCT o_orderdate) FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
                   count(DISTINCT o_orderpriority) FROM orders
        """,
        "hist2_equidepth": """
            WITH bounds AS (
              SELECT quantile_cont(l_extendedprice,
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
              FROM lineitem
            )
            SELECT len(list_filter(bs, x -> l_extendedprice > x))
                     AS bucket,
                   count(*) AS n,
                   min(l_extendedprice) AS lo,
                   max(l_extendedprice) AS hi
            FROM lineitem CROSS JOIN bounds
            GROUP BY 1
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
        "set_ops_all": """
            WITH y96 AS (
              SELECT o_orderpriority FROM orders
              WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
                AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
            ),
            y97 AS (
              SELECT o_orderpriority FROM orders
              WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
                AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
            )
            SELECT o_orderpriority, 'surplus_96' AS bag
            FROM (SELECT * FROM y96 EXCEPT ALL SELECT * FROM y97)
            UNION ALL
            SELECT o_orderpriority, 'common' AS bag
            FROM (SELECT * FROM y96 INTERSECT ALL SELECT * FROM y97)
        """,
        "j9_nullsafe_join": """
            WITH clicks AS (
              SELECT CASE WHEN value >= 100 THEN user_id % 10 END AS bk,
                     count(*) AS n_clicks
              FROM events WHERE event_type = 'click' GROUP BY 1
            ),
            views AS (
              SELECT CASE WHEN value >= 100 THEN user_id % 10 END AS bk,
                     count(*) AS n_views
              FROM events WHERE event_type = 'view' GROUP BY 1
            )
            SELECT clicks.bk AS bucket, n_clicks, n_views
            FROM clicks JOIN views
              ON clicks.bk IS NOT DISTINCT FROM views.bk
        """,
        "st3_stream_static_join": """
            SELECT e.event_type,
                   CAST(count(*) * max(d.w) AS BIGINT) AS weighted_n
            FROM events e
            JOIN (VALUES ('click', 1), ('view', 2), ('error', 3),
                         ('purchase', 4), ('signup', 5)) AS d(event_type, w)
              ON e.event_type = d.event_type
            GROUP BY e.event_type
        """,
        "sessionization": _SESSIONIZATION_SQL,
        "window_tumbling": _TUMBLING_SQL,
        # streaming twins: a bounded AvailableNow run must equal batch
        "st1_stream_tumbling": _TUMBLING_SQL,
        "st13_stream_sliding": """
            WITH expanded AS (
              SELECT time_bucket(INTERVAL '5 minutes', ts)
                       - j.jn * INTERVAL '5 minutes' AS window_start,
                     event_type, value
              FROM events, (SELECT unnest(range(2)) AS jn) j
            )
            SELECT window_start, event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_value
            FROM expanded GROUP BY 1, 2
        """,
        "st2_stream_sessions": _SESSIONIZATION_SQL,
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
        "dd6_embed_cosine": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b, {_COS} AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE {_COS} >= 0.4
        """,
        "ss12_truncated_recall": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     (embedding::DOUBLE[])[1:16] AS tv
              FROM embeddings
            ),
            q AS (SELECT vec_id AS qid, v AS qv, tv AS qtv FROM e
                  WHERE vec_id % 50 = 0),
            scored AS (
              SELECT q.qid, e.vec_id AS cid,
                     list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))) AS cosf,
                     list_dot_product(q.qtv, e.tv)
                       / (sqrt(list_dot_product(q.qtv, q.qtv))
                          * sqrt(list_dot_product(e.tv, e.tv))) AS cost
              FROM q, e WHERE e.vec_id <> q.qid
            ),
            fullk AS (
              SELECT qid, cid FROM (
                SELECT qid, cid,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY cosf DESC, cid) AS rk
                FROM scored
              ) WHERE rk <= 10
            ),
            trunck AS (
              SELECT qid, cid FROM (
                SELECT qid, cid,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY cost DESC, cid) AS rk
                FROM scored
              ) WHERE rk <= 10
            ),
            hits AS (
              SELECT qid, count(*) AS n
              FROM fullk JOIN trunck USING (qid, cid) GROUP BY qid
            )
            SELECT q.qid, CAST(coalesce(h.n, 0) AS INTEGER) AS n_hit,
                   CAST(coalesce(h.n, 0) AS DOUBLE) / 10.0 AS recall
            FROM q LEFT JOIN hits h USING (qid)
        """,
        "dc5_semantic_decontaminate": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            t AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 0),
            ev AS (SELECT vec_id AS eid, v AS evv FROM e
                   WHERE vec_id % 50 = 0),
            scored AS (
              SELECT t.vec_id,
                     list_dot_product(t.v, ev.evv)
                       / (sqrt(list_dot_product(t.v, t.v))
                          * sqrt(list_dot_product(ev.evv, ev.evv))) AS cos
              FROM t, ev
            )
            SELECT vec_id, CAST(count(*) AS INTEGER) AS n_eval_hits,
                   max(cos) AS max_cos
            FROM scored WHERE cos >= 0.4 GROUP BY vec_id
        """,
        "ss11_recall_eval": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM e
                  WHERE vec_id % 50 = 0),
            scored AS (
              SELECT q.qid, e.vec_id AS cid,
                     list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))) AS cos
              FROM q, e WHERE e.vec_id <> q.qid
            ),
            exact AS (
              SELECT qid, cid FROM (
                SELECT qid, cid,
                       row_number() OVER (PARTITION BY qid
                                          ORDER BY cos DESC, cid) AS rk
                FROM scored
              ) WHERE rk <= 10
            ),
            cent AS (SELECT vec_id AS ccid, v AS cv FROM e
                     WHERE vec_id < 8),
            assign AS (
              SELECT vec_id, ccid AS cluster FROM (
                SELECT a.vec_id, cent.ccid,
                  row_number() OVER (PARTITION BY a.vec_id ORDER BY
                    list_dot_product(a.v, cent.cv)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                    cent.ccid) AS rn
                FROM e a, cent
              ) WHERE rn = 1
            ),
            ivf AS (
              SELECT qid, cid FROM (
                SELECT s.qid, s.cid,
                       row_number() OVER (PARTITION BY s.qid
                                          ORDER BY s.cos DESC, s.cid) AS rk
                FROM scored s
                JOIN assign qa ON qa.vec_id = s.qid
                JOIN assign ca ON ca.vec_id = s.cid
                               AND ca.cluster = qa.cluster
              ) WHERE rk <= 10
            ),
            hits AS (
              SELECT qid, count(*) AS n_hit
              FROM exact JOIN ivf USING (qid, cid) GROUP BY qid
            )
            SELECT q.qid, CAST(coalesce(h.n_hit, 0) AS INTEGER) AS n_hit,
                   CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 10.0 AS recall
            FROM q LEFT JOIN hits h USING (qid)
        """,
        "dd7_embed_blocked": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 16),
            assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT a.vec_id, cent.cid,
                  row_number() OVER (PARTITION BY a.vec_id ORDER BY
                    list_dot_product(a.v, cent.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(cent.v, cent.v))) DESC,
                    cent.cid) AS rn
                FROM e a, cent
              ) WHERE rn = 1
            )
            SELECT a.vec_id AS a, b.vec_id AS b, {_COS} AS cosine
            FROM e a
            JOIN assign ca ON a.vec_id = ca.vec_id
            JOIN assign cb ON cb.cluster = ca.cluster
            JOIN e b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
            WHERE {_COS} >= 0.3
        """,
        "dd14_semdedup": f"""
            WITH RECURSIVE e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            cent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 16),
            assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT a.vec_id, cent.cid,
                  row_number() OVER (PARTITION BY a.vec_id ORDER BY
                    list_dot_product(a.v, cent.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(cent.v, cent.v))) DESC,
                    cent.cid) AS rn
                FROM e a, cent
              ) WHERE rn = 1
            ),
            pairs AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM e a
              JOIN assign ca ON a.vec_id = ca.vec_id
              JOIN assign cb ON cb.cluster = ca.cluster
              JOIN e b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
              WHERE {_COS} >= 0.3
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e2.a AS node, r.label
              FROM edges e2 JOIN reach r ON r.node = e2.b
            ),
            cc AS (
              SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
            )
            SELECT node AS vec_id, cluster_id AS rep_id
            FROM cc WHERE cluster_id <> node
        """,
        "ss3_ivf_topk": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 8),
            assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT a.vec_id, cent.cid,
                  row_number() OVER (PARTITION BY a.vec_id ORDER BY
                    list_dot_product(a.v, cent.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(cent.v, cent.v))) DESC,
                    cent.cid) AS rn
                FROM e a, cent
              ) WHERE rn = 1
            ),
            qc AS (SELECT cluster FROM assign WHERE vec_id = 0),
            cand AS (
              SELECT e.vec_id, e.v FROM e
              JOIN assign ON e.vec_id = assign.vec_id
              JOIN qc ON assign.cluster = qc.cluster
              WHERE e.vec_id <> 0
            ),
            q AS (SELECT v FROM e WHERE vec_id = 0),
            scored AS (
              SELECT a.vec_id AS neighbor_id, {_COS} AS cosine
              FROM cand a, q b
            )
            SELECT neighbor_id, CAST(rn AS INTEGER) AS rank, cosine FROM (
              SELECT *, row_number() OVER (ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= 10
        """,
        "mm1_media_features": """
            WITH hx AS (
              SELECT doc_id, hex(encode(text)) AS h,
                     octet_length(encode(text)) AS nb
              FROM documents
            ),
            pos AS (
              SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
            ),
            sums AS (
              SELECT doc_id, i % 8 AS bucket,
                     CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                              ::INTEGER) AS BIGINT) AS s
              FROM pos GROUP BY doc_id, i % 8
            ),
            grid AS (
              SELECT d.doc_id, g.bucket
              FROM documents d
              CROSS JOIN (SELECT unnest(range(8)) AS bucket) g
            ),
            hist AS (
              SELECT grid.doc_id, grid.bucket, COALESCE(sums.s, 0) AS s
              FROM grid LEFT JOIN sums
                ON grid.doc_id = sums.doc_id AND grid.bucket = sums.bucket
            )
            SELECT d.doc_id AS media_id, 'image' AS kind,
                   CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
                   '[' || string_agg(CAST(h.s AS VARCHAR), ',' ORDER BY h.bucket)
                       || ']' AS feature_json
            FROM documents d JOIN hist h ON d.doc_id = h.doc_id
            GROUP BY d.doc_id, d.text
        """,
        "mm2_media_meta": """
            SELECT doc_id AS media_id, 'image' AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "st14_stream_phash_probe": """
            WITH hx AS (
              SELECT doc_id, hex(encode(text)) AS h,
                     octet_length(encode(text)) AS nb
              FROM documents
            ),
            pos AS (
              SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
            ),
            cellsum AS (
              SELECT doc_id, CAST(i % 72 AS INTEGER) AS k,
                     CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                              ::INTEGER) AS BIGINT) AS s
              FROM pos GROUP BY doc_id, i % 72
            ),
            grid AS (
              SELECT d.doc_id, CAST(g.k AS INTEGER) AS k
              FROM documents d
              CROSS JOIN (SELECT unnest(range(72)) AS k) g
            ),
            cells AS (
              SELECT grid.doc_id, grid.k, COALESCE(cellsum.s, 0) AS s
              FROM grid LEFT JOIN cellsum
                ON grid.doc_id = cellsum.doc_id AND grid.k = cellsum.k
            ),
            bits AS (
              SELECT a.doc_id,
                     CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                     CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
              FROM cells a JOIN cells b
                ON a.doc_id = b.doc_id AND b.k = a.k + 1
              WHERE a.k % 9 <> 8
            ),
            bands AS (
              SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                     CAST(sum(CAST(bit AS BIGINT)
                              * (1::BIGINT << (j % 16))) AS BIGINT) AS band_val
              FROM bits GROUP BY doc_id, j // 16
            ),
            cand AS (
              SELECT DISTINCT least(p.doc_id, x.doc_id) AS a,
                              greatest(p.doc_id, x.doc_id) AS b
              FROM bands p JOIN bands x
                ON p.band_idx = x.band_idx AND p.band_val = x.band_val
              WHERE p.doc_id % 5 = 0 AND x.doc_id % 5 <> 0
            ),
            ham AS (
              SELECT c.a, c.b,
                     CAST(sum(CASE WHEN ba.bit <> bb.bit
                              THEN 1 ELSE 0 END) AS INTEGER) AS hamming
              FROM cand c
              JOIN bits ba ON ba.doc_id = c.a
              JOIN bits bb ON bb.doc_id = c.b AND bb.j = ba.j
              GROUP BY c.a, c.b
            )
            SELECT a, b, hamming FROM ham WHERE hamming <= 3
        """,
        "mm5_phash_neardup": """
            WITH hx AS (
              SELECT doc_id, hex(encode(text)) AS h,
                     octet_length(encode(text)) AS nb
              FROM documents
            ),
            pos AS (
              SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
            ),
            cellsum AS (
              SELECT doc_id, CAST(i % 72 AS INTEGER) AS k,
                     CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                              ::INTEGER) AS BIGINT) AS s
              FROM pos GROUP BY doc_id, i % 72
            ),
            grid AS (
              SELECT d.doc_id, CAST(g.k AS INTEGER) AS k
              FROM documents d
              CROSS JOIN (SELECT unnest(range(72)) AS k) g
            ),
            cells AS (
              SELECT grid.doc_id, grid.k, COALESCE(cellsum.s, 0) AS s
              FROM grid LEFT JOIN cellsum
                ON grid.doc_id = cellsum.doc_id AND grid.k = cellsum.k
            ),
            bits AS (
              -- dHash bit j = r*8 + c: grid cell (r*9+c) > (r*9+c+1)
              SELECT a.doc_id,
                     CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                     CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
              FROM cells a JOIN cells b
                ON a.doc_id = b.doc_id AND b.k = a.k + 1
              WHERE a.k % 9 <> 8
            ),
            bands AS (
              SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                     CAST(sum(CAST(bit AS BIGINT)
                              * (1::BIGINT << (j % 16))) AS BIGINT) AS band_val
              FROM bits GROUP BY doc_id, j // 16
            ),
            cand AS (
              SELECT DISTINCT l.doc_id AS media_a, r.doc_id AS media_b
              FROM bands l JOIN bands r
                ON l.band_idx = r.band_idx AND l.band_val = r.band_val
               AND l.doc_id < r.doc_id
            ),
            ham AS (
              SELECT c.media_a, c.media_b,
                     CAST(sum(CASE WHEN ba.bit <> bb.bit
                              THEN 1 ELSE 0 END) AS INTEGER) AS hamming
              FROM cand c
              JOIN bits ba ON ba.doc_id = c.media_a
              JOIN bits bb ON bb.doc_id = c.media_b AND bb.j = ba.j
              GROUP BY c.media_a, c.media_b
            )
            SELECT media_a, media_b, hamming FROM ham WHERE hamming <= 3
        """,
        "mm3_frame_sample": """
            SELECT doc_id AS media_id,
                   CAST(g.i AS INTEGER) AS frame_idx,
                   CAST(g.i * 1000 AS INTEGER) AS offset_ms
            FROM documents,
            LATERAL (
              SELECT unnest(generate_series(
                0, CAST(ceil(CAST(n_chars * 10 AS DOUBLE) / 1000) AS BIGINT) - 1
              )) AS i
            ) g
            WHERE n_chars * 10 > 0
        """,
        "json_extract": """
            SELECT event_type,
                   count(CAST(json_extract_string(props, '$.k') AS INTEGER))
                     AS n_k,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                        AS BIGINT) AS sum_k,
                   max(CAST(json_extract_string(props, '$.k') AS INTEGER))
                     AS max_k
            FROM events GROUP BY event_type
        """,
        "ta5_token_pieces": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+'
                   )) AS INTEGER) AS n_pieces
            FROM documents
        """,
        "dd1_exact_dedup": f"""
            SELECT md5({_NORM}) AS fingerprint,
                   min(doc_id) AS keep_id, count(*) AS group_size
            FROM documents GROUP BY 1
        """,
        "dd2_minhash_bands": _MINHASH_BANDS_SQL,
        "dd3_lsh_pairs": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL})
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM bands l JOIN bands r
              ON l.band_id = r.band_id AND l.band_hash = r.band_hash
            WHERE l.doc_id < r.doc_id
        """,
        "dd4_simhash": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
            ),
            hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
                     ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
              FROM tok
            ),
            sums AS (
              SELECT doc_id,
{_SIMHASH_SUM_TERMS}
              FROM hx GROUP BY doc_id
            )
            SELECT doc_id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash FROM sums
        """,
        "a10_count_distinct": """
            SELECT l_returnflag,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT l_partkey) AS n_part,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        """,
        "dd8_simhash_pairs": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
            ),
            hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
                     ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
              FROM tok
            ),
            sums AS (
              SELECT doc_id,
{_SIMHASH_SUM_TERMS}
              FROM hx GROUP BY doc_id
            ),
            sig AS (
              SELECT doc_id, CAST({_SIMHASH_BITS} AS BIGINT) AS simhash
              FROM sums
            ),
            bands AS (
              SELECT doc_id, simhash, b.band_idx,
                     (simhash >> (16 * b.band_idx)) & 65535 AS band_val
              FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_idx) b
            ),
            cand AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                     l.simhash AS sa, r.simhash AS sb
              FROM bands l JOIN bands r
                ON l.band_idx = r.band_idx AND l.band_val = r.band_val
              WHERE l.doc_id < r.doc_id
            )
            SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
            FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "ta6_winnow": """
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, substr(t, g.i, 5) AS gram
              FROM norm, LATERAL (
                SELECT unnest(generate_series(
                  1, greatest(length(t) - 4, 1))) AS i
              ) g
            )
            SELECT doc_id,
                   min(('0x' || substr(md5(gram), 1, 8))::BIGINT) AS winnow
            FROM grams GROUP BY doc_id
        """,
        "dd16_minhash_estimate": f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            sh AS ({_SHINGLES3}),
            hx AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
            sig AS (
              SELECT doc_id,
{_MINHASH_TERMS}
              FROM hx GROUP BY doc_id
            ),
            est AS (
              SELECT p.a, p.b,
                     ({" + ".join(f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(16))})
                       AS n_match
              FROM pairs p
              JOIN sig sa ON sa.doc_id = p.a
              JOIN sig sb ON sb.doc_id = p.b
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
              FROM hx l JOIN hx r ON l.x = r.x AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT e.a, e.b, CAST(e.n_match AS INTEGER) AS n_match,
                   CAST(e.n_match AS DOUBLE) / 16.0 AS est_jaccard,
                   coalesce(CAST(i.i AS DOUBLE)
                            / (sa.n + sb.n - i.i), 0.0) AS jaccard
            FROM est e
            JOIN sizes sa ON e.a = sa.doc_id
            JOIN sizes sb ON e.b = sb.doc_id
            LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
        """,
        "dd15_containment": f"""
            WITH sh AS ({_SHINGLES3}),
            hx AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
            sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS intersect_size
              FROM hx l JOIN hx r ON l.x = r.x AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, intersect_size,
                   CAST(intersect_size AS DOUBLE)
                     / CAST(sa.n AS DOUBLE) AS containment_a,
                   CAST(intersect_size AS DOUBLE)
                     / CAST(sb.n AS DOUBLE) AS containment_b
            FROM inter
            JOIN sizes sa ON inter.a = sa.doc_id
            JOIN sizes sb ON inter.b = sb.doc_id
            WHERE CAST(intersect_size AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.5
               OR CAST(intersect_size AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.5
        """,
        "dd19_lsh_verified": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            e AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            ids AS (SELECT a AS doc_id FROM e
                    UNION SELECT b AS doc_id FROM e),
            sh AS ({_SHINGLES3}),
            hx AS (
              SELECT sh.doc_id, {_HASH32.format(x='shingle')} AS x
              FROM sh JOIN ids USING (doc_id)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS intersect_size
              FROM hx l JOIN hx r ON l.x = r.x AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT i.a, i.b, i.intersect_size,
                   sa.n + sb.n - i.intersect_size AS union_size,
                   CAST(i.intersect_size AS DOUBLE)
                     / (sa.n + sb.n - i.intersect_size) AS jaccard
            FROM inter i
            JOIN e ON e.a = i.a AND e.b = i.b
            JOIN sizes sa ON i.a = sa.doc_id
            JOIN sizes sb ON i.b = sb.doc_id
            WHERE CAST(i.intersect_size AS DOUBLE)
                    / (sa.n + sb.n - i.intersect_size) >= 0.5
        """,
        "dd5_ngram_jaccard": f"""
            WITH sh AS ({_SHINGLES3}),
            hx AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
            sizes AS (SELECT doc_id, count(*) AS n FROM hx GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS intersect_size
              FROM hx l JOIN hx r ON l.x = r.x AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, intersect_size,
                   sa.n + sb.n - intersect_size AS union_size,
                   CAST(intersect_size AS DOUBLE)
                     / (sa.n + sb.n - intersect_size) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.a = sa.doc_id
            JOIN sizes sb ON inter.b = sb.doc_id
            ORDER BY jaccard DESC, a, b LIMIT 20
        """,
        "dd5b_ngram_capped": f"""
            WITH sh AS ({_SHINGLES3}),
            hx0 AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
            freq AS (SELECT x, count(*) AS df FROM hx0 GROUP BY x),
            hx AS (
              SELECT hx0.doc_id, hx0.x
              FROM hx0 JOIN freq ON hx0.x = freq.x
              WHERE freq.df <= 50
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM hx0 GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS intersect_size
              FROM hx l JOIN hx r ON l.x = r.x AND l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, intersect_size,
                   sa.n + sb.n - intersect_size AS union_size,
                   CAST(intersect_size AS DOUBLE)
                     / (sa.n + sb.n - intersect_size) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.a = sa.doc_id
            JOIN sizes sb ON inter.b = sb.doc_id
            ORDER BY jaccard DESC, a, b LIMIT 20
        """,
        "s5_pdf_parse": _S5_PARSE_SQL,
        # REAL-BYTES twin: same expected output, but the Spark side
        # produces it by writing an actual PDF and decoding the bytes
        # (sources/pdf_decode.py) — a green row proves the decode
        "s5b_pdf_decode": _S5_PARSE_SQL,
        "ret1_bm25_topk": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (
              SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS avgdl
              FROM dl
            ),
            dft AS (
              SELECT tok, count(*) AS df FROM (
                SELECT DISTINCT doc_id, tok FROM tok
              ) GROUP BY tok
            ),
            terms AS (
              SELECT tok, df FROM dft ORDER BY df DESC, tok LIMIT 3
            ),
            tf AS (
              SELECT t.doc_id, t.tok, any_value(te.df) AS df,
                     count(*) AS tf
              FROM tok t JOIN terms te ON t.tok = te.tok
              GROUP BY t.doc_id, t.tok
            ),
            w AS (
              SELECT tf.doc_id, tf.tok,
                     ((CAST(s.n_docs AS DOUBLE) - CAST(tf.df AS DOUBLE)
                       + 0.5) / (CAST(tf.df AS DOUBLE) + 0.5))
                     * (CAST(tf.tf AS DOUBLE) * 2.2)
                     / (CAST(tf.tf AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                                / s.avgdl))) AS w
              FROM tf JOIN dl ON tf.doc_id = dl.doc_id, stats s
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms_hit,
                   sum(w ORDER BY tok) AS score
            FROM w GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        "ret2_hybrid_rrf": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            stats AS (
              SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                       AS avgdl
              FROM dl
            ),
            dft AS (
              SELECT tok, count(*) AS df FROM (
                SELECT DISTINCT doc_id, tok FROM tok
              ) GROUP BY tok
            ),
            terms AS (
              SELECT tok, df FROM dft ORDER BY df DESC, tok LIMIT 3
            ),
            tf AS (
              SELECT t.doc_id, t.tok, any_value(te.df) AS df,
                     count(*) AS tf
              FROM tok t JOIN terms te ON t.tok = te.tok
              GROUP BY t.doc_id, t.tok
            ),
            w AS (
              SELECT tf.doc_id, tf.tok,
                     ((CAST(s.n_docs AS DOUBLE) - CAST(tf.df AS DOUBLE)
                       + 0.5) / (CAST(tf.df AS DOUBLE) + 0.5))
                     * (CAST(tf.tf AS DOUBLE) * 2.2)
                     / (CAST(tf.tf AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                                / s.avgdl))) AS w
              FROM tf JOIN dl ON tf.doc_id = dl.doc_id, stats s
            ),
            bm AS (
              SELECT doc_id, sum(w ORDER BY tok) AS score
              FROM w GROUP BY doc_id
              ORDER BY score DESC, doc_id LIMIT 20
            ),
            tr AS (
              SELECT doc_id,
                     CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                          AS INTEGER) AS text_rank
              FROM bm
            ),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            a AS (SELECT * FROM e WHERE vec_id <> 0),
            b AS (SELECT v FROM e WHERE vec_id = 0),
            scored AS (
              SELECT a.vec_id AS neighbor_id, {_COS} AS cosine FROM a, b
            ),
            vr AS (
              SELECT neighbor_id AS doc_id, CAST(rn AS INTEGER) AS vec_rank
              FROM (
                SELECT *, row_number() OVER (
                  ORDER BY cosine DESC, neighbor_id) AS rn
                FROM scored
              ) WHERE rn <= 20
            ),
            fused AS (
              SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
                     tr.text_rank, vr.vec_rank,
                     COALESCE(CAST(1 AS DOUBLE)
                              / CAST(60 + tr.text_rank AS DOUBLE), 0.0)
                       + COALESCE(CAST(1 AS DOUBLE)
                                  / CAST(60 + vr.vec_rank AS DOUBLE), 0.0)
                       AS rrf_score
              FROM tr FULL JOIN vr ON tr.doc_id = vr.doc_id
            )
            SELECT doc_id, text_rank, vec_rank, rrf_score
            FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
        """,
        "ta11_lm_quality": _TA11_SQL,
        "ta14_seed_lm_quality": f"""
            WITH seed_tok AS (
              SELECT unnest({_TOKENS}) AS tok FROM documents
              WHERE doc_id % 10 < 2
            ),
            counts AS (SELECT tok, count(*) AS c FROM seed_tok GROUP BY tok),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v
              FROM counts
            ),
            toks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM documents
              WHERE doc_id % 10 >= 2
            ),
            tok AS (
              SELECT doc_id, unnest(ts) AS tok,
                     unnest(range(len(ts))) AS pos
              FROM toks
            ),
            per AS (
              SELECT t.doc_id, t.pos,
                     CAST(tot.n_total + tot.v AS DOUBLE)
                       / CAST(coalesce(co.c, 0) + 1 AS DOUBLE) AS ip
              FROM tok t LEFT JOIN counts co ON t.tok = co.tok, tot
            ),
            agg AS (
              SELECT doc_id, sum(ip ORDER BY pos) AS sum_ip,
                     count(*) AS n FROM per GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   sum_ip / CAST(n AS DOUBLE) AS seed_mean_inv_prob
            FROM agg
        """,
        "ta12_bpe_tokens": """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')
                       AS toks
              FROM documents
            )
            SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_pretokens,
                   toks[1] AS first_tok, toks[len(toks)] AS last_tok
            FROM t
        """,
        "ta1_token_count": f"SELECT doc_id, {_TOKEN_COUNT} AS n_tokens FROM documents",
        "ta2_quality": f"""
            WITH base AS (
              SELECT doc_id, text,
                     length(text) AS n_chars,
                     {_TOKEN_COUNT} AS n_tokens,
                     len(list_filter({_TOKENS},
                         t -> list_contains({_STOPWORD_SETS['en']}, t))) AS sw_hits,
                     length(text) - length(regexp_replace(text,
                       '[\\.,;:!\\?''"()\\[\\]{{}}-]', '', 'g')) AS punct_chars,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                       AS digit_chars
              FROM documents
            ),
            ratios AS (
              SELECT doc_id, n_tokens,
                CASE WHEN n_tokens > 0
                     THEN CAST(sw_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     ELSE 0.0 END AS stopword_ratio,
                CASE WHEN n_chars > 0
                     THEN CAST(punct_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END AS punct_ratio,
                CASE WHEN n_chars > 0
                     THEN CAST(digit_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END AS digit_ratio
              FROM base
            )
            SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, digit_ratio,
              least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              + least(stopword_ratio * 5.0, 1.0) * 0.3
              + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.15
              + (1.0 - least(digit_ratio * 4.0, 1.0)) * 0.15 AS quality_score
            FROM ratios
        """,
        "j8_full_outer": """
            WITH s AS (
              SELECT s_nationkey AS nk, count(*) AS n_supp
              FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
            ),
            c AS (
              SELECT c_nationkey AS nk, count(*) AS n_cust
              FROM customer WHERE c_acctbal > 9900 GROUP BY 1
            )
            SELECT coalesce(s.nk, c.nk) AS nk, n_supp, n_cust
            FROM s FULL OUTER JOIN c ON s.nk = c.nk
        """,
        "ts1_gapfill": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
              FROM events WHERE user_id < 40 GROUP BY 1, 2
            ),
            grid AS (
              SELECT u.user_id, g.day::DATE AS day
              FROM (SELECT DISTINCT user_id FROM daily) u,
              LATERAL (
                SELECT unnest(generate_series(
                  DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS day
              ) g
            )
            SELECT grid.user_id, grid.day, coalesce(d.n_events, 0) AS n_events
            FROM grid LEFT JOIN daily d
              ON grid.user_id = d.user_id AND grid.day = d.day
        """,
        "ts2_forward_fill": """
            WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
              FROM events WHERE event_type = 'purchase' AND user_id < 40
              GROUP BY 1, 2
            ),
            grid AS (
              SELECT u.user_id, g.day::DATE AS day
              FROM (SELECT DISTINCT user_id FROM daily) u,
              LATERAL (
                SELECT unnest(generate_series(
                  DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS day
              ) g
            ),
            dense AS (
              SELECT grid.user_id, grid.day, d.day_value
              FROM grid LEFT JOIN daily d
                ON grid.user_id = d.user_id AND grid.day = d.day
            )
            SELECT user_id, day,
                   last_value(day_value IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS filled_value
            FROM dense
        """,
        "sql1_sql_api": _SQL1,
        "corpus_build": f"""
            WITH RECURSIVE pairs AS (
              WITH bands AS ({_MINHASH_BANDS_SQL})
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            canon AS (
              SELECT d.doc_id FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
              WHERE coalesce(cc.cluster_id, d.doc_id) = d.doc_id
            ),
            qbase AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     {_TOKEN_COUNT} AS n_tokens,
                     len(list_filter({_TOKENS},
                         t -> list_contains({_STOPWORD_SETS['en']}, t))) AS sw_hits,
                     length(text) - length(regexp_replace(text,
                       '[\\.,;:!\\?''"()\\[\\]{{}}-]', '', 'g')) AS punct_chars,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                       AS digit_chars
              FROM documents
            ),
            keepers AS (
              SELECT doc_id FROM qbase
              WHERE n_tokens >= 10 AND n_tokens <= 500
                AND CASE WHEN n_tokens > 0
                    THEN CAST(sw_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                    ELSE 0.0 END >= 0.05
                AND CASE WHEN n_chars > 0
                    THEN CAST(digit_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                    ELSE 0.0 END <= 0.2
                AND CASE WHEN n_chars > 0
                    THEN CAST(punct_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                    ELSE 0.0 END <= 0.2
            ),
            sel AS (
              SELECT q.doc_id, q.n_tokens::BIGINT AS n_tokens FROM qbase q
              JOIN canon USING (doc_id) JOIN keepers USING (doc_id)
            ),
            o AS (
              SELECT doc_id, n_tokens,
                CAST(coalesce(sum(n_tokens) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS start_offset
              FROM sel
            )
            SELECT doc_id, n_tokens, start_offset,
                   CAST(floor(start_offset / 256.0) AS BIGINT) AS pack_id
            FROM o
        """,
        "ol1_zscore_outliers": """
            WITH stats AS (
              SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                       AS mean,
                     sqrt(greatest(
                       CAST(sum(CAST(value AS DECIMAL(18,2))
                                * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                         / count(*)
                       - (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                          / count(*))
                         * (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                            / count(*)),
                       0.0)) AS sd
              FROM events GROUP BY event_type
            )
            SELECT event_id, e.event_type, value,
                   (CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) - mean) / sd AS z
            FROM events e JOIN stats s ON e.event_type = s.event_type
            WHERE sd > 0
              AND abs((CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) - mean) / sd)
                  > 2.5
        """,
        "hist1_totalprice": """
            SELECT CAST(floor(o_totalprice / 20000.0) AS INTEGER) AS bucket,
                   count(*) AS n
            FROM orders GROUP BY 1
        """,
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
        "inc_agg_merge": """
            SELECT l_returnflag, count(*) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_value,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*) AS avg_value,
                   min(l_quantity) AS min_value, max(l_quantity) AS max_value
            FROM lineitem GROUP BY l_returnflag
        """,
        "ta7_quality_filter": f"""
            WITH base AS (
              SELECT doc_id, text,
                     length(text) AS n_chars,
                     {_TOKEN_COUNT} AS n_tokens,
                     len(list_filter({_TOKENS},
                         t -> list_contains({_STOPWORD_SETS['en']}, t))) AS sw_hits,
                     length(text) - length(regexp_replace(text,
                       '[\\.,;:!\\?''"()\\[\\]{{}}-]', '', 'g')) AS punct_chars,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                       AS digit_chars
              FROM documents
            ),
            ratios AS (
              SELECT doc_id, n_tokens,
                CASE WHEN n_tokens > 0
                     THEN CAST(sw_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                     ELSE 0.0 END AS stopword_ratio,
                CASE WHEN n_chars > 0
                     THEN CAST(punct_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END AS punct_ratio,
                CASE WHEN n_chars > 0
                     THEN CAST(digit_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
                     ELSE 0.0 END AS digit_ratio
              FROM base
            )
            SELECT doc_id,
                   n_tokens >= 10 AND n_tokens <= 500
                   AND stopword_ratio >= 0.05
                   AND digit_ratio <= 0.2
                   AND punct_ratio <= 0.2 AS keep
            FROM ratios
        """,
        "ta3_lang_id": f"""
            WITH scores AS (
              SELECT doc_id,
{_LANG_SCORES}
              FROM documents
            )
            SELECT doc_id, {_LANG_CASE} AS lang_guess FROM scores
        """,
        "ta13_lang_confusion": f"""
            WITH scores AS (
              SELECT doc_id, lang,
{_LANG_SCORES}
              FROM documents
            ),
            guessed AS (
              SELECT lang, {_LANG_CASE} AS lang_guess FROM scores
            ),
            cells AS (
              SELECT lang, lang_guess, count(*) AS n
              FROM guessed GROUP BY lang, lang_guess
            ),
            totals AS (SELECT lang, count(*) AS tot FROM guessed GROUP BY lang)
            SELECT c.lang, c.lang_guess, c.n,
                   CAST((c.n * 10000) // t.tot AS BIGINT) AS share_bp
            FROM cells c JOIN totals t ON c.lang = t.lang
        """,
        "ta4_fingerprint": f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
        "tp5_sliding_chunks": f"""
            WITH t AS (
              SELECT doc_id, {_TOKENS} AS toks, {_TOKEN_COUNT} AS n FROM documents
            ),
            base AS (
              SELECT doc_id, toks, n,
                     1 + (greatest(n - 16, 0) + 11) // 12 AS n_chunks
              FROM t WHERE n > 0
            )
            SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
                   array_to_string(list_slice(toks, i*12 + 1, i*12 + 16), ' ')
                     AS chunk_text,
                   CAST(len(list_slice(toks, i*12 + 1, i*12 + 16)) AS INTEGER)
                     AS n_chunk_tokens
            FROM base,
            LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) g
        """,
        "tp6_group_sample": f"""
            SELECT doc_id, source FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY source
              ORDER BY {_HASH32.format(x="'gs:' || doc_id")}, doc_id
            ) <= 3
        """,
        "st5_stream_stream_join": """
            SELECT p.event_id AS purchase_id, v.event_id AS view_id,
                   p.user_id AS user_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id
             AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
        """,
        "st4_stream_dedup": """
            SELECT event_type, count(*) AS cnt FROM (
              SELECT DISTINCT * FROM events
            ) GROUP BY event_type
        """,
        "dd9_dup_clusters": f"""
            WITH RECURSIVE pairs AS (
              WITH bands AS ({_MINHASH_BANDS_SQL})
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
            SELECT d.doc_id,
                   coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
                   coalesce(cc.cluster_id, d.doc_id) = d.doc_id AS is_canonical
            FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
        """,
        "range_join": """
            SELECT c_custkey, p_partkey, c_acctbal, p_retailprice
            FROM customer JOIN part
              ON c_acctbal >= p_retailprice
             AND c_acctbal < p_retailprice + p_size / 100.0
        """,
        "dd10_dedup_keeper": f"""
            WITH RECURSIVE pairs AS (
              WITH bands AS ({_MINHASH_BANDS_SQL})
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            tc AS (SELECT doc_id, {_TOKEN_COUNT} AS n_tokens FROM documents),
            sized AS (
              SELECT cc.node, cc.cluster_id, tc.n_tokens
              FROM cc JOIN tc ON cc.node = tc.doc_id
            ),
            keep AS (
              SELECT cluster_id, node AS keeper_id FROM (
                SELECT cluster_id, node,
                       row_number() OVER (PARTITION BY cluster_id
                         ORDER BY n_tokens DESC, node) AS rn
                FROM sized
              ) WHERE rn = 1
            )
            SELECT s.node AS doc_id, s.cluster_id, k.keeper_id
            FROM sized s JOIN keep k USING (cluster_id)
            WHERE s.node <> k.keeper_id
        """,
        "corpus_build2": f"""
            WITH RECURSIVE lmq AS ({_TA11_SQL}),
            quality AS (
              SELECT doc_id FROM lmq
              WHERE n_tokens >= 10 AND mean_inv_prob <= 35.0
            ),
            fdocs AS (
              SELECT d.doc_id, d.text
              FROM documents d JOIN quality q ON d.doc_id = q.doc_id
            ),
            bands AS ({_MINHASH_BANDS_SQL.replace("FROM documents", "FROM fdocs")}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            tc AS (SELECT doc_id, {_TOKEN_COUNT} AS n_tokens FROM fdocs),
            sized AS (
              SELECT cc.node, cc.cluster_id, tc.n_tokens
              FROM cc JOIN tc ON cc.node = tc.doc_id
            ),
            keep AS (
              SELECT cluster_id, node AS keeper_id FROM (
                SELECT cluster_id, node,
                       row_number() OVER (PARTITION BY cluster_id
                         ORDER BY n_tokens DESC, node) AS rn
                FROM sized
              ) WHERE rn = 1
            ),
            drops AS (
              SELECT s.node AS doc_id
              FROM sized s JOIN keep k USING (cluster_id)
              WHERE s.node <> k.keeper_id
            ),
            clean AS (
              SELECT * FROM fdocs
              WHERE doc_id NOT IN (SELECT doc_id FROM drops)
            ),
            stoks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM clean
              WHERE {_NORM} <> ''
            ),
            sseg AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
                     array_to_string(
                       list_slice(ts, CAST(g.i * 10 + 1 AS INTEGER),
                                  CAST(g.i * 10 + 10 AS INTEGER)), ' ') AS seg
              FROM stoks, LATERAL (
                SELECT unnest(range(CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i
              ) g
            ),
            skept AS (
              SELECT doc_id, seg_idx, seg FROM (
                SELECT doc_id, seg_idx, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, seg_idx) AS rn
                FROM sseg
              ) WHERE rn = 1
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS deduped_text
            FROM skept GROUP BY doc_id
        """,
        "corpus_build4": f"""
            WITH seed_tok AS (
              SELECT unnest({_TOKENS}) AS tok FROM documents
              WHERE doc_id % 10 < 2
            ),
            counts AS (SELECT tok, count(*) AS c FROM seed_tok GROUP BY tok),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v
              FROM counts
            ),
            toks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM documents
              WHERE doc_id % 10 >= 2
            ),
            tok AS (
              SELECT doc_id, unnest(ts) AS tok,
                     unnest(range(len(ts))) AS pos
              FROM toks
            ),
            per AS (
              SELECT t.doc_id, t.pos,
                     CAST(tot.n_total + tot.v AS DOUBLE)
                       / CAST(coalesce(co.c, 0) + 1 AS DOUBLE) AS ip
              FROM tok t LEFT JOIN counts co ON t.tok = co.tok, tot
            ),
            agg AS (
              SELECT doc_id, sum(ip ORDER BY pos) AS sum_ip,
                     count(*) AS n FROM per GROUP BY doc_id
            ),
            scored AS (
              SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                     sum_ip / CAST(n AS DOUBLE) AS q
              FROM agg
            ),
            cum AS (
              SELECT doc_id, n_tokens, q,
                     CAST(sum(n_tokens) OVER (
                       ORDER BY q, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS cum_tokens
              FROM scored
            ),
            picked AS (
              SELECT * FROM cum WHERE cum_tokens <= 20000
            )
            SELECT doc_id, n_tokens, cum_tokens,
                   CAST(row_number() OVER (ORDER BY q, doc_id)
                        AS BIGINT) AS curriculum_pos
            FROM picked
        """,
        "corpus_build3": f"""
            WITH RECURSIVE scores AS (
              SELECT doc_id, source, text,
{_LANG_SCORES}
              FROM documents
            ),
            endocs AS MATERIALIZED (
              SELECT doc_id, source, text FROM scores
              WHERE {_LANG_CASE} = 'en'
            ),
            toks0 AS MATERIALIZED (SELECT doc_id, {_TOKENS} AS ts FROM endocs),
            tok0 AS (
              SELECT doc_id, unnest(ts) AS tok,
                     unnest(range(len(ts))) AS pos
              FROM toks0
            ),
            counts0 AS (SELECT tok, count(*) AS c FROM tok0 GROUP BY tok),
            tot0 AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v
              FROM counts0
            ),
            per0 AS (
              SELECT t0.doc_id, t0.pos,
                     CAST(tot0.n_total + tot0.v AS DOUBLE)
                       / CAST(co.c + 1 AS DOUBLE) AS ip
              FROM tok0 t0 JOIN counts0 co ON t0.tok = co.tok, tot0
            ),
            lmq AS (
              SELECT doc_id, count(*) AS n_tokens,
                     sum(ip ORDER BY pos) / CAST(count(*) AS DOUBLE)
                       AS mean_inv_prob
              FROM per0 GROUP BY doc_id
            ),
            qdocs AS (
              SELECT e.doc_id, e.source, e.text
              FROM endocs e JOIN lmq ON e.doc_id = lmq.doc_id
              WHERE lmq.n_tokens >= 10 AND lmq.mean_inv_prob <= 40.0
            ),
            sdocs AS MATERIALIZED (
              SELECT doc_id, source,
                     regexp_replace(
                       regexp_replace(text,
                         '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
                       '555-[0-9]{{4}}', '<PHONE>', 'g') AS text
              FROM qdocs
            ),
            evt AS (
              SELECT doc_id, {_TOKENS} AS toks FROM documents
              WHERE doc_id % 50 = 0
            ),
            evg AS (
              SELECT DISTINCT
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM evt, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                        AS u(i)
            ),
            trw AS (SELECT doc_id, {_TOKENS} AS toks FROM sdocs
                    WHERE doc_id % 50 <> 0),
            trg AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM trw, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                        AS u(i)
            ),
            contam AS (SELECT DISTINCT g.doc_id FROM trg g JOIN evg USING (gram)),
            cdocs AS MATERIALIZED (
              SELECT * FROM sdocs
              WHERE doc_id % 50 <> 0
                AND doc_id NOT IN (SELECT doc_id FROM contam)
            ),
            bands AS MATERIALIZED ({_MINHASH_BANDS_SQL.replace("FROM documents", "FROM cdocs")}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            tc AS (SELECT doc_id, {_TOKEN_COUNT} AS n_tokens FROM cdocs),
            sized AS (
              SELECT cc.node, cc.cluster_id, tc.n_tokens
              FROM cc JOIN tc ON cc.node = tc.doc_id
            ),
            keep AS (
              SELECT cluster_id, node AS keeper_id FROM (
                SELECT cluster_id, node,
                       row_number() OVER (PARTITION BY cluster_id
                         ORDER BY n_tokens DESC, node) AS rn
                FROM sized
              ) WHERE rn = 1
            ),
            drops AS (
              SELECT s.node AS doc_id
              FROM sized s JOIN keep k USING (cluster_id)
              WHERE s.node <> k.keeper_id
            ),
            kdocs AS MATERIALIZED (
              SELECT * FROM cdocs
              WHERE doc_id NOT IN (SELECT doc_id FROM drops)
            ),
            stoks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM kdocs
              WHERE {_NORM} <> ''
            ),
            sseg AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
                     array_to_string(
                       list_slice(ts, CAST(g.i * 10 + 1 AS INTEGER),
                                  CAST(g.i * 10 + 10 AS INTEGER)), ' ') AS seg
              FROM stoks, LATERAL (
                SELECT unnest(range(CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i
              ) g
            ),
            skept AS (
              SELECT doc_id, seg_idx, seg FROM (
                SELECT doc_id, seg_idx, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, seg_idx) AS rn
                FROM sseg
              ) WHERE rn = 1
            ),
            seg AS (
              SELECT doc_id,
                     string_agg(sk.seg, ' ' ORDER BY seg_idx) AS deduped_text
              FROM skept sk GROUP BY doc_id
            ),
            surv AS MATERIALIZED (
              SELECT s.doc_id, k.source, s.deduped_text
              FROM seg s JOIN kdocs k USING (doc_id)
            ),
            mt(src, t_bp) AS (VALUES {", ".join(
                f"('{k}', {v})" for k, v in sorted(MIXTURE_TARGETS_BP.items())
            )}),
            mcounts AS (
              SELECT source AS src, count(*) AS n
              FROM surv WHERE source IN (SELECT src FROM mt)
              GROUP BY source
            ),
            caps AS (
              SELECT src, t_bp, (n * 10000) // t_bp AS cap
              FROM mcounts JOIN mt USING (src)
            ),
            mtot AS (SELECT min(cap) AS T FROM caps),
            quota AS (
              SELECT src, (T * t_bp) // 10000 AS m
              FROM caps CROSS JOIN mtot
            ),
            ranked AS (
              SELECT doc_id, source AS src,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY {_HASH32.format(
                           x="'mix:' || CAST(doc_id AS VARCHAR)")}, doc_id
                     ) AS rk
              FROM surv WHERE source IN (SELECT src FROM mt)
            ),
            sampled AS MATERIALIZED (
              SELECT doc_id, src AS source
              FROM ranked JOIN quota USING (src) WHERE rk <= m
            ),
            ptext AS (
              SELECT sa.doc_id, sa.source, sv.deduped_text AS text
              FROM sampled sa JOIN surv sv USING (doc_id)
            ),
            pt AS (
              SELECT doc_id, source, CAST({_TOKEN_COUNT} AS BIGINT) AS n_tokens
              FROM ptext
            ),
            po AS (
              SELECT doc_id, source, n_tokens,
                CAST(coalesce(sum(n_tokens) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS start_offset
              FROM pt
            ),
            shr AS (
              SELECT doc_id,
                     {_HASH32.format(
                         x="'shuffle-v1:' || CAST(doc_id AS VARCHAR)")} AS hv
              FROM sampled
            )
            SELECT po.doc_id, po.source, po.n_tokens, po.start_offset,
                   CAST(floor(po.start_offset / 256.0) AS BIGINT) AS pack_id,
                   CAST(hv % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (PARTITION BY hv % 8
                        ORDER BY hv, po.doc_id) AS INTEGER) AS position
            FROM po JOIN shr USING (doc_id)
        """,
        "tp11_curriculum_order": f"""
            WITH lmq AS ({_TA11_SQL})
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY mean_inv_prob, doc_id)
                        AS BIGINT) AS curriculum_pos
            FROM lmq
        """,
        "tp10_budget_select": f"""
            WITH lmq AS ({_TA11_SQL}),
            o AS (
              SELECT doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (
                       ORDER BY mean_inv_prob, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS cum_tokens
              FROM lmq
            )
            SELECT doc_id, n_tokens, cum_tokens FROM o
            WHERE cum_tokens <= 20000
        """,
        "dc3_leakage_safe_split": f"""
            WITH RECURSIVE pairs AS (
              WITH bands AS ({_MINHASH_BANDS_SQL})
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
            cl AS (
              SELECT d.doc_id,
                     coalesce(cc.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
            )
            SELECT doc_id, cluster_id,
                   CASE WHEN {_HASH32.format(
                       x="'split:' || CAST(cluster_id AS VARCHAR)")} % 10 < 9
                        THEN 'train' ELSE 'eval' END AS split
            FROM cl
        """,
        "st7_stream_corpus_ingest": f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            kept AS (
              SELECT * FROM documents
              WHERE doc_id NOT IN (SELECT b FROM pairs)
            ),
            stoks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM kept
              WHERE {_NORM} <> ''
            ),
            sseg AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
                     array_to_string(
                       list_slice(ts, CAST(g.i * 10 + 1 AS INTEGER),
                                  CAST(g.i * 10 + 10 AS INTEGER)), ' ') AS seg
              FROM stoks, LATERAL (
                SELECT unnest(range(CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i
              ) g
            ),
            skept AS (
              SELECT doc_id, seg_idx, seg FROM (
                SELECT doc_id, seg_idx, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, seg_idx) AS rn
                FROM sseg
              ) WHERE rn = 1
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS deduped_text
            FROM skept GROUP BY doc_id
        """,
        "st6_stream_lsh_probe": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            nb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
            ob AS (SELECT * FROM bands WHERE doc_id % 5 <> 0)
            SELECT DISTINCT least(n.doc_id, o.doc_id) AS a,
                   greatest(n.doc_id, o.doc_id) AS b
            FROM nb n JOIN ob o
              ON n.band_id = o.band_id AND n.band_hash = o.band_hash
            WHERE n.doc_id <> o.doc_id
        """,
        "st8_stream_decontaminate": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0)
            SELECT DISTINCT g.doc_id
            FROM g JOIN ev USING (gram)
            WHERE g.doc_id % 7 <> 0
        """,
        "dd12_incremental_lsh": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            nb AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
            ob AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
            cross_pairs AS (
              SELECT least(n.doc_id, o.doc_id) AS a,
                     greatest(n.doc_id, o.doc_id) AS b
              FROM nb n JOIN ob o
                ON n.band_id = o.band_id AND n.band_hash = o.band_hash
              WHERE n.doc_id <> o.doc_id
            ),
            self_pairs AS (
              SELECT l.doc_id AS a, r.doc_id AS b
              FROM nb l JOIN nb r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            )
            SELECT DISTINCT a, b FROM (
              SELECT a, b FROM cross_pairs
              UNION ALL SELECT a, b FROM self_pairs
            )
        """,
        "dd13_repeated_spans": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM documents
              WHERE {_NORM} <> ''
            ),
            win AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS off,
                     md5(array_to_string(
                       list_slice(ts, CAST(g.i + 1 AS INTEGER),
                                  CAST(g.i + 10 AS INTEGER)), ' ')) AS h
              FROM toks, LATERAL (
                SELECT unnest(range(CAST(len(ts) - 10 + 1 AS BIGINT))) AS i
              ) g
              WHERE len(ts) >= 10
            ),
            dup AS (
              SELECT doc_id, off FROM (
                SELECT doc_id, off, count(*) OVER (PARTITION BY h) AS c
                FROM win
              ) WHERE c >= 2
            ),
            isl AS (
              SELECT doc_id, off,
                     sum(CASE WHEN prev IS NULL OR off - prev > 10
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY off) AS island
              FROM (
                SELECT doc_id, off,
                       lag(off) OVER (PARTITION BY doc_id
                                      ORDER BY off) AS prev
                FROM dup
              )
            ),
            spans AS (
              SELECT doc_id, island, min(off) AS s, max(off) + 9 AS e
              FROM isl GROUP BY doc_id, island
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
                   CAST(sum(e - s + 1) AS INTEGER) AS dup_tokens,
                   CAST(max(e - s + 1) AS INTEGER) AS longest_span
            FROM spans GROUP BY doc_id
        """,
        "dd13b_repeated_spans_sampled": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM documents
              WHERE {_NORM} <> ''
            ),
            win AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS off,
                     ('0x' || substr(md5(array_to_string(
                       list_slice(ts, CAST(g.i + 1 AS INTEGER),
                                  CAST(g.i + 10 AS INTEGER)), ' ')),
                       1, 10))::BIGINT * 2097152 + CAST(g.i AS BIGINT)
                       AS comb
              FROM toks, LATERAL (
                SELECT unnest(range(CAST(len(ts) - 10 + 1 AS BIGINT))) AS i
              ) g
              WHERE len(ts) >= 10 AND len(ts) < 2097152
            ),
            m AS (
              SELECT doc_id,
                     min(comb) OVER (PARTITION BY doc_id ORDER BY off
                                     ROWS BETWEEN CURRENT ROW
                                     AND 7 FOLLOWING) AS m
              FROM win
            ),
            sel AS (
              SELECT DISTINCT doc_id, m FROM m
            ),
            dec AS (
              SELECT doc_id, m % 2097152 AS off, m // 2097152 AS h
              FROM sel
            ),
            dup AS (
              SELECT doc_id, off FROM (
                SELECT doc_id, off, count(*) OVER (PARTITION BY h) AS c
                FROM dec
              ) WHERE c >= 2
            ),
            isl AS (
              SELECT doc_id, off,
                     sum(CASE WHEN prev IS NULL OR off - prev > 17
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY off) AS island
              FROM (
                SELECT doc_id, off,
                       lag(off) OVER (PARTITION BY doc_id
                                      ORDER BY off) AS prev
                FROM dup
              )
            ),
            spans AS (
              SELECT doc_id, island, min(off) AS s, max(off) + 9 AS e
              FROM isl GROUP BY doc_id, island
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
                   CAST(sum(e - s + 1) AS INTEGER) AS dup_tokens,
                   CAST(max(e - s + 1) AS INTEGER) AS longest_span
            FROM spans GROUP BY doc_id
        """,
        "corpus_refresh1": f"""
            WITH fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint
                        FROM documents),
            newd AS (SELECT * FROM fp WHERE doc_id >= 250),
            oldfp AS (SELECT DISTINCT fingerprint FROM fp
                      WHERE doc_id < 250),
            exact AS (
              SELECT DISTINCT n.doc_id FROM newd n
              JOIN oldfp USING (fingerprint)
            ),
            bands AS ({_MINHASH_BANDS_SQL}),
            nb AS (SELECT * FROM bands WHERE doc_id >= 250),
            ob AS (SELECT * FROM bands WHERE doc_id < 250),
            pairs AS (
              SELECT DISTINCT a, b FROM (
                SELECT least(n.doc_id, o.doc_id) AS a,
                       greatest(n.doc_id, o.doc_id) AS b
                FROM nb n JOIN ob o
                  ON n.band_id = o.band_id AND n.band_hash = o.band_hash
                WHERE n.doc_id <> o.doc_id
                UNION ALL
                SELECT l.doc_id AS a, r.doc_id AS b
                FROM nb l JOIN nb r
                  ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                WHERE l.doc_id < r.doc_id
              )
            ),
            near_old AS (SELECT DISTINCT b AS doc_id FROM pairs
                         WHERE a < 250 AND b >= 250),
            near_new AS (SELECT DISTINCT b AS doc_id FROM pairs
                         WHERE a >= 250),
            w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
            contam AS (
              SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)
              WHERE g.doc_id >= 250
            )
            SELECT n.doc_id,
                   CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                        WHEN no_.doc_id IS NOT NULL THEN 'near_dup_old'
                        WHEN nn.doc_id IS NOT NULL THEN 'near_dup_new'
                        WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                        ELSE 'kept' END AS verdict
            FROM newd n
            LEFT JOIN exact e ON n.doc_id = e.doc_id
            LEFT JOIN near_old no_ ON n.doc_id = no_.doc_id
            LEFT JOIN near_new nn ON n.doc_id = nn.doc_id
            LEFT JOIN contam c ON n.doc_id = c.doc_id
        """,
        "dd18_intradoc_dedup": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS ts FROM documents),
            seg AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
                     array_to_string(
                       list_slice(ts, CAST(g.i * 10 + 1 AS INTEGER),
                                  CAST(g.i * 10 + 10 AS INTEGER)), ' ') AS seg
              FROM toks, LATERAL (
                SELECT unnest(range(CAST(ceil(greatest(len(ts), 1) / 10.0)
                                         AS BIGINT))) AS i
              ) g
            ),
            flagged AS (
              SELECT doc_id, seg_idx, seg,
                     row_number() OVER (PARTITION BY doc_id, md5(seg)
                                        ORDER BY seg_idx) AS rn
              FROM seg
            )
            SELECT doc_id,
                   CAST(count(*) AS INTEGER) AS n_segs,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INTEGER)
                     AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx)
                     FILTER (WHERE rn = 1) AS deduped_text
            FROM flagged GROUP BY doc_id
        """,
        "dd17_cdc_segments": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            b AS (
              SELECT doc_id, toks,
                     CASE WHEN len(toks) <= 8 THEN []::BIGINT[] ELSE
                       list_filter(generate_series(8, len(toks) - 1),
                         i -> ('0x' || substr(md5(array_to_string(
                                 list_slice(toks, i - 7, i), ' ')), 1, 8)
                              )::BIGINT % 16 = 0)
                     END AS bpos
              FROM w
            ),
            sp AS (
              SELECT doc_id, toks,
                     list_prepend(1, list_transform(bpos, x -> x + 1))
                       AS starts,
                     list_append(bpos, len(toks)) AS ends
              FROM b
            ),
            segrows AS (
              SELECT doc_id, k,
                     array_to_string(
                       list_slice(toks, starts[k], ends[k]), ' ') AS seg
              FROM sp, unnest(generate_series(1, len(starts))) AS s(k)
            ),
            keep AS (
              SELECT doc_id, k, seg FROM (
                SELECT doc_id, k, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, k) AS rn
                FROM segrows) WHERE rn = 1
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_kept,
                     string_agg(seg, ' ' ORDER BY k) AS deduped_text
              FROM keep GROUP BY doc_id
            )
            SELECT sp.doc_id,
                   CAST(len(sp.starts) AS INTEGER) AS n_segs,
                   CAST(coalesce(a.n_kept, 0) AS INTEGER) AS n_kept,
                   coalesce(a.deduped_text, '') AS deduped_text
            FROM sp LEFT JOIN agg a USING (doc_id)
        """,
        "dd11_segment_dedup": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKENS} AS ts FROM documents
              WHERE {_NORM} <> ''
            ),
            seg AS (
              SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
                     array_to_string(
                       list_slice(ts, CAST(g.i * 10 + 1 AS INTEGER),
                                  CAST(g.i * 10 + 10 AS INTEGER)), ' ') AS seg
              FROM toks, LATERAL (
                SELECT unnest(range(CAST(ceil(len(ts) / 10.0) AS BIGINT))) AS i
              ) g
              WHERE len(ts) > 0
            ),
            kept AS (
              SELECT doc_id, seg_idx, seg FROM (
                SELECT doc_id, seg_idx, seg,
                       row_number() OVER (PARTITION BY md5(seg)
                                          ORDER BY doc_id, seg_idx) AS rn
                FROM seg
              ) WHERE rn = 1
            )
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
                   string_agg(seg, ' ' ORDER BY seg_idx) AS deduped_text
            FROM kept GROUP BY doc_id
        """,
        "ss7_pq_codes": f"""
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
            comp AS (
              SELECT e.vec_id, cent.cid, dd.d,
                     CAST(dd.d // 8 AS INTEGER) AS s,
                     e.v[CAST(dd.d + 1 AS INTEGER)]
                       - cent.cv[CAST(dd.d + 1 AS INTEGER)] AS df
              FROM e, cent, (SELECT unnest(range(64)) AS d) dd
            ),
            dist AS (
              SELECT vec_id, cid, s, sum(df * df ORDER BY d) AS dist
              FROM comp GROUP BY vec_id, cid, s
            ),
            best AS (
              SELECT vec_id, s, cid FROM (
                SELECT vec_id, s, cid,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY dist, cid) AS rn
                FROM dist
              ) WHERE rn = 1
            )
            SELECT vec_id,
                   {", ".join(f"max(CASE WHEN s = {s} THEN cid END) AS code_{s}" for s in range(8))}
            FROM best GROUP BY vec_id
        """,
        "ss8_pq_adc_topk": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
            comp AS (
              SELECT e.vec_id, cent.cid, dd.d,
                     CAST(dd.d // 8 AS INTEGER) AS s,
                     e.v[CAST(dd.d + 1 AS INTEGER)]
                       - cent.cv[CAST(dd.d + 1 AS INTEGER)] AS df
              FROM e, cent, (SELECT unnest(range(64)) AS d) dd
            ),
            dist AS (
              SELECT vec_id, cid, s, sum(df * df ORDER BY d) AS dist
              FROM comp GROUP BY vec_id, cid, s
            ),
            best AS (
              SELECT vec_id, s, cid FROM (
                SELECT vec_id, s, cid,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY dist, cid) AS rn
                FROM dist
              ) WHERE rn = 1
            ),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            lcomp AS (
              SELECT cent.cid, dd.d, CAST(dd.d // 8 AS INTEGER) AS s,
                     q.qv[CAST(dd.d + 1 AS INTEGER)]
                       - cent.cv[CAST(dd.d + 1 AS INTEGER)] AS df
              FROM q, cent, (SELECT unnest(range(64)) AS d) dd
            ),
            lut AS (
              SELECT cid, s, sum(df * df ORDER BY d) AS dlut
              FROM lcomp GROUP BY cid, s
            ),
            scored AS (
              SELECT b.vec_id, sum(l.dlut ORDER BY b.s) AS approx_dist
              FROM best b JOIN lut l ON l.cid = b.cid AND l.s = b.s
              WHERE b.vec_id <> 0
              GROUP BY b.vec_id
            )
            SELECT vec_id AS neighbor_id,
                   CAST(row_number() OVER (ORDER BY approx_dist, vec_id)
                        AS INTEGER) AS rank,
                   approx_dist
            FROM scored ORDER BY approx_dist, vec_id LIMIT 10
        """,
        "ss10_ivf_pq_search": f"""
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            icent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 8),
            q AS (SELECT v FROM e WHERE vec_id = 0),
            probed AS (
              SELECT cid AS cluster FROM (
                SELECT icent.cid,
                  row_number() OVER (ORDER BY
                    list_dot_product(q.v, icent.v)
                      / (sqrt(list_dot_product(q.v, q.v))
                         * sqrt(list_dot_product(icent.v, icent.v))) DESC,
                    icent.cid) AS rn
                FROM q, icent
              ) WHERE rn <= 2
            ),
            assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT a.vec_id, icent.cid,
                  row_number() OVER (PARTITION BY a.vec_id ORDER BY
                    list_dot_product(a.v, icent.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(icent.v, icent.v))) DESC,
                    icent.cid) AS rn
                FROM e a, icent
              ) WHERE rn = 1
            ),
            cand AS (
              SELECT e.vec_id, e.v FROM e
              JOIN assign ON e.vec_id = assign.vec_id
              JOIN probed ON assign.cluster = probed.cluster
              WHERE e.vec_id <> 0
            ),
            pcent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
            comp AS (
              SELECT c.vec_id, pcent.cid, dd.d,
                     CAST(dd.d // 8 AS INTEGER) AS s,
                     c.v[CAST(dd.d + 1 AS INTEGER)]
                       - pcent.cv[CAST(dd.d + 1 AS INTEGER)] AS df
              FROM cand c, pcent, (SELECT unnest(range(64)) AS d) dd
            ),
            dist AS (
              SELECT vec_id, cid, s, sum(df * df ORDER BY d) AS dist
              FROM comp GROUP BY vec_id, cid, s
            ),
            best AS (
              SELECT vec_id, s, cid FROM (
                SELECT vec_id, s, cid,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY dist, cid) AS rn
                FROM dist
              ) WHERE rn = 1
            ),
            lcomp AS (
              SELECT pcent.cid, dd.d, CAST(dd.d // 8 AS INTEGER) AS s,
                     q.v[CAST(dd.d + 1 AS INTEGER)]
                       - pcent.cv[CAST(dd.d + 1 AS INTEGER)] AS df
              FROM q, pcent, (SELECT unnest(range(64)) AS d) dd
            ),
            lut AS (
              SELECT cid, s, sum(df * df ORDER BY d) AS dlut
              FROM lcomp GROUP BY cid, s
            ),
            adc AS (
              SELECT b.vec_id, sum(l.dlut ORDER BY b.s) AS approx_dist
              FROM best b JOIN lut l ON l.cid = b.cid AND l.s = b.s
              GROUP BY b.vec_id
            ),
            short AS (
              SELECT vec_id FROM adc ORDER BY approx_dist, vec_id LIMIT 64
            ),
            rer AS (
              SELECT a.vec_id AS neighbor_id, {_COS} AS cosine
              FROM e a
              JOIN short ON a.vec_id = short.vec_id
              CROSS JOIN (SELECT v FROM e WHERE vec_id = 0) b
            )
            SELECT neighbor_id, CAST(rn AS INTEGER) AS rank, cosine FROM (
              SELECT *, row_number() OVER (ORDER BY cosine DESC,
                                           neighbor_id) AS rn
              FROM rer
            ) WHERE rn <= 10
        """,
        "ss6_quantize_int8": """
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            el AS (
              SELECT vec_id, unnest(v) AS x, unnest(range(len(v))) AS pos
              FROM e
            ),
            mm AS (
              SELECT vec_id, min(x) AS mn, max(x) AS mx,
                     (max(x) - min(x)) / 255.0 AS scale
              FROM el GROUP BY vec_id
            ),
            q AS (
              SELECT el.vec_id, el.pos,
                     CASE WHEN mm.mx = mm.mn THEN 0
                          ELSE CAST(least(floor((el.x - mm.mn) / mm.scale),
                                          255) AS INTEGER) END AS qi,
                     el.x, mm.mn, mm.mx, mm.scale
              FROM el JOIN mm USING (vec_id)
            )
            SELECT vec_id,
                   any_value(scale) AS scale,
                   any_value(mn) AS zero_point,
                   '[' || string_agg(CAST(qi AS VARCHAR), ',' ORDER BY pos)
                       || ']' AS q_json,
                   CASE WHEN any_value(mx) = any_value(mn) THEN 0.0
                        ELSE max(abs(x - (mn + CAST(qi AS DOUBLE) * scale)))
                   END AS max_abs_err
            FROM q GROUP BY vec_id
        """,
        "st10_stream_embed_probe": f"""
            WITH e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            corpus AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
            newv AS (SELECT * FROM e WHERE vec_id % 5 = 0),
            cent AS (SELECT vec_id AS cid, v AS cv FROM corpus
                     WHERE vec_id < 16),
            cassign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT c.vec_id, cent.cid,
                  row_number() OVER (PARTITION BY c.vec_id ORDER BY
                    list_dot_product(c.v, cent.cv)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                    cent.cid) AS rn
                FROM corpus c, cent
              ) WHERE rn = 1
            ),
            nassign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT n.vec_id, cent.cid,
                  row_number() OVER (PARTITION BY n.vec_id ORDER BY
                    list_dot_product(n.v, cent.cv)
                      / (sqrt(list_dot_product(n.v, n.v))
                         * sqrt(list_dot_product(cent.cv, cent.cv))) DESC,
                    cent.cid) AS rn
                FROM newv n, cent
              ) WHERE rn = 1
            )
            SELECT a.vec_id, b.vec_id AS match_id, {_COS} AS cosine
            FROM newv a
            JOIN nassign na ON a.vec_id = na.vec_id
            JOIN cassign ca ON ca.cluster = na.cluster
            JOIN corpus b ON b.vec_id = ca.vec_id
            WHERE {_COS} >= 0.3
        """,
        "sk8_heavy_hitters": """
            SELECT CAST(user_id AS VARCHAR) AS key,
                   count(*) AS n
            FROM events GROUP BY 1 HAVING count(*) >= 80
        """,
        "st19_stream_heavy_hitters": """
            SELECT CAST(user_id AS VARCHAR) AS key,
                   count(*) AS n
            FROM events GROUP BY 1 HAVING count(*) >= 80
        """,
        "st18_stream_word_hist": f"""
            SELECT arr[i] AS w, count(*) AS freq
            FROM (SELECT {_TOKENS} AS arr FROM documents),
                 unnest(generate_series(1, len(arr))) AS s(i)
            WHERE length(arr[i]) >= 1
            GROUP BY 1
        """,
        "st9_stream_hll": """
            WITH h AS (
              SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))::BIGINT AS h
              FROM lineitem
            ),
            parts AS (
              SELECT h // 4398046511104 AS register,
                     h % 4398046511104 AS w
              FROM h
            )
            SELECT register,
                   CAST(max(CASE WHEN w = 0 THEN 43
                                 ELSE 43 - length(bin(w)) END) AS BIGINT)
                     AS rho
            FROM parts GROUP BY register
        """,
        "st12_stream_temperature_sample": f"""
            WITH strat AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 6 THEN 'heavy'
                          WHEN doc_id % 10 < 9 THEN 'mid'
                          ELSE 'light' END AS stratum
              FROM documents
            ),
            counts AS (
              SELECT stratum, count(*) AS n FROM strat GROUP BY stratum
            ),
            nmin AS (SELECT min(n) AS nmin FROM counts),
            rates AS (
              SELECT stratum,
                     CAST(floor(sqrt(CAST(nmin AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                * 4294967296.0) AS BIGINT) AS thr
              FROM counts, nmin
            )
            SELECT d.doc_id, d.stratum
            FROM strat d JOIN rates r ON d.stratum = r.stratum
            WHERE {_HASH32.format(x="'temp:' || CAST(d.doc_id AS VARCHAR)")} < r.thr
        """,
        "tp14_domain_upsample": f"""
            WITH rated AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 25000
                                 WHEN 'src1' THEN 12000
                                 ELSE 10000 END AS rate,
                     ({_HASH32.format(x="'up:' || doc_id")} % 10000) AS h
              FROM documents
            ),
            counted AS (
              SELECT doc_id, source,
                     rate // 10000
                     + CASE WHEN h < rate % 10000 THEN 1 ELSE 0 END AS n
              FROM rated
            )
            SELECT doc_id, source, CAST(i AS INTEGER) AS copy_idx
            FROM counted, unnest(generate_series(0, n - 1)) AS s(i)
            WHERE n >= 1
        """,
        "tp13_epoch_reshuffle": f"""
            WITH ep AS (
              SELECT doc_id, e.epoch
              FROM documents,
                   (SELECT unnest(range(3)) AS epoch) e
            ),
            h AS (
              SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
                     {_HASH32.format(x="'epoch' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS hh
              FROM ep
            )
            SELECT epoch, doc_id,
                   CAST(hh % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (PARTITION BY epoch, hh % 8
                                           ORDER BY hh, doc_id)
                        AS INTEGER) AS position
            FROM h
        """,
        "tp12_temperature_sample": f"""
            WITH strat AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 6 THEN 'heavy'
                          WHEN doc_id % 10 < 9 THEN 'mid'
                          ELSE 'light' END AS stratum
              FROM documents
            ),
            counts AS (
              SELECT stratum, count(*) AS n FROM strat GROUP BY stratum
            ),
            nmin AS (SELECT min(n) AS nmin FROM counts),
            rates AS (
              SELECT stratum,
                     CAST(floor(sqrt(CAST(nmin AS DOUBLE)
                                     / CAST(n AS DOUBLE))
                                * 4294967296.0) AS BIGINT) AS thr
              FROM counts, nmin
            )
            SELECT d.doc_id, d.stratum
            FROM strat d JOIN rates r ON d.stratum = r.stratum
            WHERE {_HASH32.format(x="'temp:' || CAST(d.doc_id AS VARCHAR)")} < r.thr
        """,
        "sk4_hll_distinct": """
            WITH h AS (
              SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))::BIGINT AS h
              FROM lineitem
            ),
            parts AS (
              SELECT h // 4398046511104 AS register,
                     h % 4398046511104 AS w
              FROM h
            ),
            rho AS (
              SELECT register,
                     max(CASE WHEN w = 0 THEN 43
                              ELSE 43 - length(bin(w)) END) AS rho
              FROM parts GROUP BY register
            )
            SELECT 1024 AS m, CAST(count(*) AS INTEGER) AS observed,
                   (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                     / (sum(power(2.0, -rho))
                        + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
            FROM rho
        """,
        "sk5_hll_rollup": """
            -- each level computed DIRECTLY from the raw rows; equality
            -- with the engine's merged-register path IS the sketch
            -- mergeability property under oracle check
            WITH rel AS (
              SELECT n.n_name, r.r_name, CAST(o.o_custkey AS VARCHAR) AS cust
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
            ),
            parts AS (
              SELECT n_name, r_name,
                     (('0x' || substr(md5(cust), 1, 13))::BIGINT)
                       // 4398046511104 AS register,
                     (('0x' || substr(md5(cust), 1, 13))::BIGINT)
                       % 4398046511104 AS w
              FROM rel
            ),
            rho_nation AS (
              SELECT n_name, register,
                     max(CASE WHEN w = 0 THEN 43
                              ELSE 43 - length(bin(w)) END) AS rho
              FROM parts GROUP BY n_name, register
            ),
            rho_region AS (
              SELECT r_name, register,
                     max(CASE WHEN w = 0 THEN 43
                              ELSE 43 - length(bin(w)) END) AS rho
              FROM parts GROUP BY r_name, register
            ),
            rho_global AS (
              SELECT register,
                     max(CASE WHEN w = 0 THEN 43
                              ELSE 43 - length(bin(w)) END) AS rho
              FROM parts GROUP BY register
            )
            SELECT 'nation' AS level, n_name AS key, 1024 AS m,
                   CAST(count(*) AS INTEGER) AS observed,
                   (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                     / (sum(power(2.0, -rho))
                        + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
            FROM rho_nation GROUP BY n_name
            UNION ALL
            SELECT 'region' AS level, r_name AS key, 1024 AS m,
                   CAST(count(*) AS INTEGER) AS observed,
                   (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                     / (sum(power(2.0, -rho))
                        + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
            FROM rho_region GROUP BY r_name
            UNION ALL
            SELECT 'global' AS level, 'ALL' AS key, 1024 AS m,
                   CAST(count(*) AS INTEGER) AS observed,
                   (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                     / (sum(power(2.0, -rho))
                        + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
            FROM rho_global
        """,
        "sk6_kmv_set_ops": f"""
            WITH a AS (
              SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
              FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1997-01-01'
            ),
            b AS (
              SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
              FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
            ),
            tagged AS (
              SELECT h, 1 AS in_a, 0 AS in_b FROM a
              UNION ALL
              SELECT h, 0 AS in_a, 1 AS in_b FROM b
            ),
            merged AS (
              SELECT h, max(in_a) AS in_a, max(in_b) AS in_b
              FROM tagged GROUP BY h
            ),
            kmin AS (SELECT * FROM merged ORDER BY h LIMIT 256),
            base AS (
              SELECT CAST(count(*) AS INTEGER) AS k_used,
                     max(h) AS kth_hash,
                     CAST(sum(in_a * in_b) AS INTEGER) AS n_both
              FROM kmin
            )
            SELECT k_used, kth_hash, n_both,
                   CAST(k_used - 1 AS DOUBLE) * 4294967296.0 / kth_hash
                     AS union_est,
                   (CAST(n_both AS DOUBLE)
                    * (CAST(k_used - 1 AS DOUBLE) * 4294967296.0 / kth_hash))
                     / CAST(k_used AS DOUBLE) AS inter_est,
                   CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)
                     AS jaccard_est
            FROM base
        """,
        "sk7_quantile_sketch": """
            WITH b AS (
              SELECT CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bucket,
                     count(*) AS cnt
              FROM lineitem GROUP BY 1
            ),
            c AS (
              SELECT bucket, cnt,
                     CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
              FROM b
            ),
            n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM b),
            qs (q_num, q_den) AS (VALUES (1, 2), (19, 20), (99, 100)),
            ks AS (
              SELECT q_num, q_den,
                     (n_total * CAST(q_num AS BIGINT)
                      + CAST(q_den AS BIGINT) - 1) // CAST(q_den AS BIGINT)
                       AS k,
                     n_total
              FROM qs, n
            )
            SELECT q_num, q_den, k, n_total, c.bucket,
                   CAST(c.bucket AS DOUBLE) * 1000.0
                     + 1000.0 * (CAST(ks.k - (c.cum - c.cnt) AS DOUBLE)
                                 / CAST(c.cnt AS DOUBLE)) AS est
            FROM ks JOIN c ON c.cum >= ks.k AND (c.cum - c.cnt) < ks.k
        """,
        "st16_stream_quantile": """
            WITH b AS (
              SELECT CAST(floor(value / 5.0) AS BIGINT) AS bucket,
                     count(*) AS cnt
              FROM events GROUP BY 1
            ),
            c AS (
              SELECT bucket, cnt,
                     CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
              FROM b
            ),
            n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM b),
            qs (q_num, q_den) AS (VALUES (1, 4), (1, 2), (19, 20), (99, 100)),
            ks AS (
              SELECT q_num, q_den,
                     (n_total * CAST(q_num AS BIGINT)
                      + CAST(q_den AS BIGINT) - 1) // CAST(q_den AS BIGINT)
                       AS k,
                     n_total
              FROM qs, n
            )
            SELECT q_num, q_den, k, n_total, c.bucket,
                   CAST(c.bucket AS DOUBLE) * 5.0
                     + 5.0 * (CAST(ks.k - (c.cum - c.cnt) AS DOUBLE)
                              / CAST(c.cnt AS DOUBLE)) AS est
            FROM ks JOIN c ON c.cum >= ks.k AND (c.cum - c.cnt) < ks.k
        """,
        "sk1_kmv_distinct": f"""
            WITH h AS (
              SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
              FROM lineitem
            ),
            kmin AS (SELECT h FROM h ORDER BY h LIMIT 256)
            SELECT CAST(count(*) AS INTEGER) AS k, max(h) AS kth_hash,
                   CAST(count(*) - 1 AS DOUBLE) * 4294967296.0 / max(h) AS estimate
            FROM kmin
        """,
        "scd2_intervals": """
            SELECT event_id, user_id, value, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS valid_to,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL AS is_current
            FROM events WHERE event_type IN ('signup', 'purchase')
        """,
        "asof_join": """
            SELECT p.event_id, p.user_id, p.ts,
                   v.event_id AS view_event_id, v.value AS view_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN LATERAL (
              SELECT event_id, value FROM events v
              WHERE v.user_id = p.user_id AND v.event_type = 'view'
                AND v.ts <= p.ts
              ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
            ) v ON true
        """,
        "asof4_tolerance": """
            SELECT p.event_id, p.user_id, p.ts,
                   v.event_id AS view_event_id, v.value AS view_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN LATERAL (
              SELECT event_id, value FROM events v
              WHERE v.user_id = p.user_id AND v.event_type = 'view'
                AND v.ts <= p.ts
                AND v.ts >= p.ts - INTERVAL 30 MINUTE
              ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
            ) v ON true
        """,
        "asof2_forward": """
            SELECT p.event_id, p.user_id, p.ts,
                   v.event_id AS view_event_id, v.value AS view_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN LATERAL (
              SELECT event_id, value FROM events v
              WHERE v.user_id = p.user_id AND v.event_type = 'view'
                AND v.ts >= p.ts
              ORDER BY v.ts ASC, v.event_id ASC LIMIT 1
            ) v ON true
        """,
        "asof3_nearest": """
            SELECT p.event_id, p.user_id, p.ts,
                   v.event_id AS view_event_id, v.value AS view_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN LATERAL (
              SELECT event_id, value FROM events v
              WHERE v.user_id = p.user_id AND v.event_type = 'view'
              ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
                       (v.ts > p.ts) ASC,
                       CASE WHEN v.ts <= p.ts THEN -v.event_id
                            ELSE v.event_id END ASC
              LIMIT 1
            ) v ON true
        """,
        "tp1_pack": f"""
            WITH t AS (SELECT doc_id, {_TOKEN_COUNT}::BIGINT AS n_tokens FROM documents),
            o AS (
              SELECT doc_id, n_tokens,
                CAST(coalesce(sum(n_tokens) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS start_offset
              FROM t
            )
            SELECT doc_id, n_tokens, start_offset,
                   CAST(floor(start_offset / 256.0) AS BIGINT) AS pack_id
            FROM o
        """,
        "tp2_stratified_sample": f"""
            SELECT doc_id, source FROM documents
            WHERE ({_HASH32.format(x="'sample:' || doc_id")} % 10000) <
              CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                          WHEN 'src2' THEN 0 ELSE 2500 END
        """,
        "tp3_boilerplate_prune": f"""
            WITH tp AS (
              SELECT doc_id, toks[i] AS tok, i AS pos
              FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents) t,
              LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
              WHERE toks[i] <> ''
            ),
            nd AS (SELECT count(*) AS n_docs FROM documents),
            boiler AS (
              SELECT tok FROM tp, nd GROUP BY tok, n_docs
              HAVING count(DISTINCT doc_id) * 100 >= 79 * n_docs
            ),
            kept AS (SELECT * FROM tp WHERE tok NOT IN (SELECT tok FROM boiler)),
            rebuilt AS (
              SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
                     string_agg(tok, ' ' ORDER BY pos) AS pruned_text
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.pruned_text, '') AS pruned_text
            FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        """,
        "tp4_shuffle_shards": f"""
            WITH h AS (
              SELECT doc_id, {_HASH32.format(x="'shuffle-v1:' || doc_id")} AS hv
              FROM documents
            )
            SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard,
                   CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
                        AS INTEGER) AS position
            FROM h
        """,
        "ss1_ann_bruteforce": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            a AS (SELECT * FROM e WHERE vec_id <> 0),
            b AS (SELECT v FROM e WHERE vec_id = 0),
            scored AS (
              SELECT a.vec_id AS neighbor_id, {_COS} AS cosine FROM a, b
            )
            SELECT neighbor_id, CAST(rn AS INTEGER) AS rank, cosine FROM (
              SELECT *, row_number() OVER (ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= 10
        """,
        "ss14_mmr_topk": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            b AS (SELECT v FROM e WHERE vec_id = 0),
            scored AS (
              SELECT a.vec_id AS neighbor_id, a.v, {_COS} AS cosine
              FROM (SELECT * FROM e WHERE vec_id <> 0) a, b
            ),
            short AS (SELECT * FROM scored
                      ORDER BY cosine DESC, neighbor_id LIMIT 20),
            pair AS (
              SELECT a.neighbor_id AS i, b.neighbor_id AS j, {_COS} AS c
              FROM short a, short b WHERE a.neighbor_id <> b.neighbor_id
            ),
            s1 AS (SELECT neighbor_id, cosine, 0.7 * cosine AS mmr
                   FROM short ORDER BY mmr DESC, neighbor_id LIMIT 1),
            sel1 AS (SELECT neighbor_id FROM s1),
            s2 AS (SELECT sh.neighbor_id, sh.cosine,
                          0.7 * sh.cosine - 0.3 * (
                            SELECT max(p.c) FROM pair p, sel1 s
                            WHERE p.i = sh.neighbor_id
                              AND p.j = s.neighbor_id) AS mmr
                   FROM short sh
                   WHERE sh.neighbor_id NOT IN (SELECT * FROM sel1)
                   ORDER BY mmr DESC, sh.neighbor_id LIMIT 1),
            sel2 AS (SELECT * FROM sel1 UNION ALL
                     SELECT neighbor_id FROM s2),
            s3 AS (SELECT sh.neighbor_id, sh.cosine,
                          0.7 * sh.cosine - 0.3 * (
                            SELECT max(p.c) FROM pair p, sel2 s
                            WHERE p.i = sh.neighbor_id
                              AND p.j = s.neighbor_id) AS mmr
                   FROM short sh
                   WHERE sh.neighbor_id NOT IN (SELECT * FROM sel2)
                   ORDER BY mmr DESC, sh.neighbor_id LIMIT 1),
            sel3 AS (SELECT * FROM sel2 UNION ALL
                     SELECT neighbor_id FROM s3),
            s4 AS (SELECT sh.neighbor_id, sh.cosine,
                          0.7 * sh.cosine - 0.3 * (
                            SELECT max(p.c) FROM pair p, sel3 s
                            WHERE p.i = sh.neighbor_id
                              AND p.j = s.neighbor_id) AS mmr
                   FROM short sh
                   WHERE sh.neighbor_id NOT IN (SELECT * FROM sel3)
                   ORDER BY mmr DESC, sh.neighbor_id LIMIT 1),
            sel4 AS (SELECT * FROM sel3 UNION ALL
                     SELECT neighbor_id FROM s4),
            s5 AS (SELECT sh.neighbor_id, sh.cosine,
                          0.7 * sh.cosine - 0.3 * (
                            SELECT max(p.c) FROM pair p, sel4 s
                            WHERE p.i = sh.neighbor_id
                              AND p.j = s.neighbor_id) AS mmr
                   FROM short sh
                   WHERE sh.neighbor_id NOT IN (SELECT * FROM sel4)
                   ORDER BY mmr DESC, sh.neighbor_id LIMIT 1)
            SELECT neighbor_id, CAST(rank AS INTEGER) AS rank, cosine, mmr
            FROM (
              SELECT 1 AS rank, * FROM s1
              UNION ALL SELECT 2, * FROM s2
              UNION ALL SELECT 3, * FROM s3
              UNION ALL SELECT 4, * FROM s4
              UNION ALL SELECT 5, * FROM s5
            )
        """,
        "ss13_filtered_ann": f"""
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            a AS (SELECT * FROM e WHERE vec_id <> 0 AND label = 4),
            b AS (SELECT v FROM e WHERE vec_id = 0),
            scored AS (
              SELECT a.vec_id AS neighbor_id, {_COS} AS cosine FROM a, b
            )
            SELECT neighbor_id, CAST(rn AS INTEGER) AS rank, cosine FROM (
              SELECT *, row_number() OVER (ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= 10
        """,
        "ss2_ivf_assign": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 8),
            scored AS (
              SELECT a.vec_id, cent.cid,
                     list_dot_product(a.v, cent.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(cent.v, cent.v))) AS cos
              FROM e a, cent
            )
            SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
              FROM scored
            ) WHERE rn = 1
        """,
        "ss9_cluster_purity": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            cent AS (SELECT vec_id AS cid, v FROM e WHERE vec_id < 8),
            scored AS (
              SELECT a.vec_id, cent.cid,
                     list_dot_product(a.v, cent.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(cent.v, cent.v))) AS cos
              FROM e a, cent
            ),
            assign AS (
              SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
                FROM scored
              ) WHERE rn = 1
            ),
            cells AS (
              SELECT a.cluster, em.label, count(*) AS n
              FROM assign a JOIN embeddings em ON a.vec_id = em.vec_id
              GROUP BY a.cluster, em.label
            ),
            top AS (
              SELECT cluster, label AS majority_label, n AS majority_n
              FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY cluster ORDER BY n DESC, label DESC) AS rn
                FROM cells
              ) WHERE rn = 1
            ),
            tot AS (SELECT cluster, sum(n) AS total FROM cells GROUP BY cluster)
            SELECT t.cluster, t.majority_label, t.majority_n,
                   CAST(tt.total AS BIGINT) AS total,
                   CAST((t.majority_n * 10000) // tt.total AS BIGINT)
                     AS purity_bp
            FROM top t JOIN tot tt ON t.cluster = tt.cluster
        """,
        "gr1_pagerank": _GR1_PAGERANK_SQL,
        "gr3_hits": _GR3_HITS_SQL,
        "gr4_triangles": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            e AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1
              JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corners AS (SELECT unnest([x, y, z]) AS doc_id FROM tri)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY doc_id
        """,
        "ts6_ewma": """
            SELECT user_id,
                   CAST(count(*) AS INTEGER) AS n_events,
                   list_reduce(list(value ORDER BY ts, event_id),
                               (acc, x) -> acc + (x - acc) / 4.0) AS ewma
            FROM events GROUP BY user_id
        """,
        "gr5_label_prop": f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            e AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            sym AS (
              SELECT a AS v, b AS u FROM e
              UNION ALL SELECT b AS v, a AS u FROM e
            ),
            l0 AS (SELECT DISTINCT v AS node, v AS lab FROM sym),
            n1 AS (SELECT s.v, l.lab, count(*) AS c
                   FROM sym s JOIN l0 l ON s.u = l.node GROUP BY 1, 2),
            l1 AS (SELECT v AS node, lab FROM (
                     SELECT v, lab, row_number() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n1)
                   WHERE rn = 1),
            n2 AS (SELECT s.v, l.lab, count(*) AS c
                   FROM sym s JOIN l1 l ON s.u = l.node GROUP BY 1, 2),
            l2 AS (SELECT v AS node, lab FROM (
                     SELECT v, lab, row_number() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n2)
                   WHERE rn = 1),
            n3 AS (SELECT s.v, l.lab, count(*) AS c
                   FROM sym s JOIN l2 l ON s.u = l.node GROUP BY 1, 2),
            l3 AS (SELECT v AS node, lab FROM (
                     SELECT v, lab, row_number() OVER (
                       PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n3)
                   WHERE rn = 1)
            SELECT node AS doc_id, lab AS community FROM l3
        """,
        "gr2_pagerank_converged": _GR2_SQL,
        "tok1_bpe_merges": _TOK1_BPE_SQL,
        "tok2_bpe_encode": _TOK2_BPE_SQL,
        "tok3_wordpiece_encode": _TOK3_WORDPIECE_SQL,
        "tok4_bpe_sampled": _TOK4_SAMPLED_SQL,
        "tok5_bpe_char_merges": _TOK5_CHAR_MERGES_SQL,
        "tok7_fertility_audit": (
            "\n            WITH "
            + _TOK5_CHAIN
            + f""",
            c4 AS (SELECT w, freq, {_TOK1_APPLY} AS arr FROM c3, wm3),
            wp AS (SELECT w, len(arr) AS np FROM c4),
            dw AS (
              SELECT doc_id, arr[i] AS w
              FROM (SELECT doc_id, {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(i)
              WHERE length(arr[i]) >= 1
            ),
            per_doc AS (
              SELECT doc_id, count(*) AS n_words,
                     CAST(SUM(np) AS BIGINT) AS n_bpe
              FROM dw JOIN wp USING (w) GROUP BY doc_id
            )
            SELECT d.source, count(*) AS n_docs,
                   CAST(SUM(p.n_words) AS BIGINT) AS n_words,
                   CAST(SUM(p.n_bpe) AS BIGINT) AS n_pieces,
                   CAST((SUM(p.n_bpe) * 10000) // SUM(p.n_words) AS BIGINT)
                     AS fertility_bp
            FROM per_doc p JOIN documents d USING (doc_id)
            GROUP BY d.source
"""
        ),
        "tok6_bpe_char_encode": _TOK6_CHAR_ENCODE_SQL,
        "corpus_report1": f"""
            WITH t AS (
              SELECT doc_id, source, {_TOKEN_COUNT} AS nt FROM documents
            ),
            scores AS (
              SELECT doc_id,
{_LANG_SCORES}
              FROM documents
            ),
            langs AS (SELECT doc_id, {_LANG_CASE} AS lang FROM scores),
            c AS (
              SELECT count(*) AS n, CAST(sum(nt) AS BIGINT) AS tt FROM t
            ),
            bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS s(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
            SELECT 'corpus' AS section, 'n_docs' AS key,
                   CAST(n AS DOUBLE) AS value FROM c
            UNION ALL
            SELECT 'corpus', 'total_tokens', CAST(tt AS DOUBLE) FROM c
            UNION ALL
            SELECT 'corpus', 'mean_doc_tokens',
                   CAST(tt AS DOUBLE) / CAST(n AS DOUBLE) FROM c
            UNION ALL
            SELECT 'lang', lang, CAST(count(*) AS DOUBLE)
            FROM langs GROUP BY lang
            UNION ALL
            SELECT 'source', source, CAST(count(*) AS DOUBLE)
            FROM documents GROUP BY source
            UNION ALL
            SELECT 'dedup', 'near_dup_pairs', CAST(count(*) AS DOUBLE)
            FROM pairs
            UNION ALL
            SELECT 'dedup', 'docs_in_dup_pairs', CAST(count(*) AS DOUBLE)
            FROM (SELECT a AS d FROM pairs UNION SELECT b AS d FROM pairs)
            UNION ALL
            SELECT 'decontamination', 'contaminated_docs',
                   CAST(count(DISTINCT g.doc_id) AS DOUBLE)
            FROM g JOIN ev USING (gram) WHERE g.doc_id % 50 <> 0
        """,
        "dc1_contamination": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
            shared AS (
              SELECT g.doc_id, count(*) AS n_shared
              FROM g JOIN ev USING (gram)
              WHERE g.doc_id % 50 <> 0
              GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(s.n_shared, 0) AS INTEGER) AS n_shared,
                   CAST(CASE WHEN coalesce(s.n_shared, 0) > 0 THEN 1 ELSE 0 END
                        AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
            WHERE d.doc_id % 50 <> 0
        """,
        "dc6_flag_in_row": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
            hit AS (
              SELECT DISTINCT g.doc_id
              FROM g JOIN ev USING (gram)
              WHERE g.doc_id % 50 <> 0
            )
            SELECT d.doc_id, d.source,
                   CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN hit h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        """,
        "dc8_scrub_spans": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            gp AS (
              SELECT doc_id, i,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM gp WHERE doc_id % 50 = 0),
            hitpos AS (
              SELECT gp.doc_id, gp.i FROM gp JOIN ev USING (gram)
              WHERE gp.doc_id % 50 <> 0
            ),
            covered AS (
              SELECT DISTINCT doc_id, c.j
              FROM hitpos, LATERAL (
                SELECT unnest(generate_series(i, i + 7)) AS j
              ) c
            ),
            tok_rows AS (
              SELECT doc_id, t.j, toks[t.j] AS tok
              FROM w, unnest(generate_series(1, len(toks))) AS t(j)
              WHERE doc_id % 50 <> 0
            )
            SELECT tr.doc_id,
                   CAST(count(*) AS INTEGER) AS n_tokens,
                   CAST(sum(CASE WHEN c.j IS NULL THEN 0 ELSE 1 END)
                        AS INTEGER) AS n_masked,
                   coalesce(string_agg(tok, ' ' ORDER BY tr.j)
                            FILTER (WHERE c.j IS NULL), '') AS scrubbed_text
            FROM tok_rows tr
            LEFT JOIN covered c ON tr.doc_id = c.doc_id AND tr.j = c.j
            GROUP BY tr.doc_id
        """,
        "dc7_bloom_decontaminate": _DC7_BLOOM_SQL,
        # the streaming probe is the identical stateless computation
        # over the identical split — batch ≡ stream, one oracle
        "st17_stream_bloom_probe": _DC7_BLOOM_SQL,
        "dc4_overlap_fraction": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
            SELECT g.doc_id,
                   CAST(count(*) AS INTEGER) AS n_grams,
                   CAST(count(ev.gram) AS INTEGER) AS n_shared,
                   CAST(count(ev.gram) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS overlap_frac
            FROM g LEFT JOIN ev USING (gram)
            WHERE g.doc_id % 50 <> 0
            GROUP BY g.doc_id
        """,
        "dc2_cross_snapshot": f"""
            WITH fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint
                        FROM documents)
            SELECT doc_id, fingerprint FROM fp
            WHERE doc_id >= 250
              AND fingerprint NOT IN
                  (SELECT fingerprint FROM fp WHERE doc_id < 250)
        """,
        "ta8_repetition": f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT doc_id,
                     array_to_string(list_slice(toks, i, i + 1), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 1, 1)))
                       AS t(i)
            ),
            c AS (SELECT doc_id, gram, count(*) AS cnt
                  FROM g GROUP BY doc_id, gram)
            SELECT doc_id,
                   CAST(sum(cnt) AS INTEGER) AS n_grams,
                   CAST(count(*) AS INTEGER) AS distinct_grams,
                   CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                     AS top_frac,
                   CAST(sum(cnt) - count(*) AS DOUBLE)
                     / CAST(sum(cnt) AS DOUBLE) AS dup_frac
            FROM c GROUP BY doc_id
        """,
        "ta9_pii_scrub": """
            WITH inj AS (
              SELECT doc_id,
                text ||
                CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com' ELSE '' END ||
                CASE WHEN doc_id % 5 = 0
                     THEN ' call 555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS raw_text
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(raw_text,
                       '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
                     '555-[0-9]{4}', '<PHONE>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(raw_text,
                     '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+')) AS INTEGER)
                     AS n_emails,
                   CAST(len(regexp_extract_all(raw_text, '555-[0-9]{4}'))
                     AS INTEGER) AS n_phones
            FROM inj
        """,
        "tfidf_top_terms": f"""
            WITH toks AS (
              SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     (CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE))
                       / CAST(dfreq.df AS DOUBLE) AS score
              FROM tf JOIN dfreq USING (term), n
            )
            SELECT doc_id, term, CAST(tf AS INTEGER) AS tf, score,
                   CAST(rnk AS INTEGER) AS rnk
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
                  FROM scored)
            WHERE rnk <= 3
        """,
        "wa1_lead_lag": """
            WITH daily AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                     CAST(o_orderdate AS DATE) AS day,
                     sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
              FROM orders GROUP BY 1, 2
            )
            SELECT yr, day, CAST(rev AS DOUBLE) AS revenue,
                   CAST(lag(rev) OVER w AS DOUBLE) AS prev_revenue,
                   CAST(rev - lag(rev) OVER w AS DOUBLE) AS delta
            FROM daily WINDOW w AS (PARTITION BY yr ORDER BY day)
        """,
        "wa2_rolling": """
            WITH daily AS (
              SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                     CAST(o_orderdate AS DATE) AS day,
                     count(*) AS n_orders
              FROM orders GROUP BY 1, 2
            )
            SELECT yr, day, CAST(n_orders AS INTEGER) AS n_orders,
                   CAST(sum(n_orders) OVER w AS INTEGER) AS roll7_orders,
                   CAST(sum(n_orders) OVER w AS DOUBLE)
                     / CAST(count(*) OVER w AS DOUBLE) AS roll7_avg
            FROM daily
            WINDOW w AS (PARTITION BY yr ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
        "wa3_range_frame": """
            WITH o AS (
              SELECT o_orderkey, o_custkey,
                     CAST(o_orderdate AS DATE) AS day,
                     date_diff('day', DATE '1992-01-01',
                               CAST(o_orderdate AS DATE)) AS dayn,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS price
              FROM orders
            )
            SELECT o_orderkey, o_custkey, day,
                   CAST(count(*) OVER w AS INTEGER) AS n_90d,
                   CAST(sum(price) OVER w AS DOUBLE) AS spend_90d
            FROM o
            WINDOW w AS (PARTITION BY o_custkey ORDER BY dayn
                         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        """,
        "wa4_ntile": """
            SELECT c_custkey, c_mktsegment,
                   CAST(c_acctbal AS DOUBLE) AS acctbal,
                   CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey)
                        AS INTEGER) AS quartile
            FROM customer
        """,
        "wa8_dist_functions": """
            SELECT c_custkey, c_mktsegment,
                   percent_rank() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey)
                     AS pct_rank,
                   cume_dist() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey)
                     AS cume
            FROM customer
        """,
        "wa5_grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
                   CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """,
        "wa6_unpivot": """
            SELECT p_partkey, 'p_retailprice' AS measure,
                   CAST(p_retailprice AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
        """,
        "wa7_semi_join": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(o_totalprice AS DOUBLE) AS totalprice
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
        """,
        "sk2_bloom": f"""
            WITH fp AS (SELECT doc_id, md5({_NORM}) AS f FROM documents),
            bits AS (
              SELECT DISTINCT bit FROM ({_BLOOM_POS.format(src="fp WHERE doc_id < 250")})
            ),
            ppos AS (
              SELECT DISTINCT doc_id, bit FROM ({_BLOOM_POS.format(src="fp")})
            ),
            stats AS (
              SELECT p.doc_id, count(*) AS n_pos,
                     sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_hit
              FROM ppos p LEFT JOIN bits b ON p.bit = b.bit
              GROUP BY p.doc_id
            )
            SELECT doc_id,
                   CAST(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END AS INTEGER)
                     AS hit
            FROM stats
        """,
        "sk3_cms": f"""
            WITH src AS (
              SELECT l_partkey, CAST(l_partkey AS VARCHAR) AS key
              FROM lineitem
            ),
            pos AS ({_CMS_POS.format(src="src", keyexpr="key")}),
            counters AS (
              SELECT j, bucket, count(*) AS cnt FROM pos GROUP BY j, bucket
            ),
            keys AS (
              SELECT l_partkey, key, count(*) AS true_cnt
              FROM src GROUP BY l_partkey, key
            ),
            kp AS ({_CMS_POS.format(src="keys", keyexpr="key")}
            ),
            est AS (
              SELECT kp.l_partkey, min(c.cnt) AS est
              FROM kp JOIN counters c ON kp.j = c.j AND kp.bucket = c.bucket
              GROUP BY kp.l_partkey
            )
            SELECT k.l_partkey, CAST(e.est AS INTEGER) AS est,
                   CAST(k.true_cnt AS INTEGER) AS true_cnt,
                   CAST(e.est - k.true_cnt AS INTEGER) AS overcount
            FROM keys k JOIN est e ON k.l_partkey = e.l_partkey
        """,
        "tp7_length_buckets": f"""
            WITH n AS (SELECT {_TOKEN_COUNT} AS n_tokens FROM documents),
            b AS (SELECT CAST(length(bin(n_tokens)) AS INTEGER) AS bucket,
                         n_tokens
                  FROM n)
            SELECT bucket,
                   CAST(1 << (bucket - 1) AS INTEGER) AS lo,
                   CAST((1 << bucket) - 1 AS INTEGER) AS hi,
                   CAST(count(*) AS INTEGER) AS n_docs,
                   CAST(sum(n_tokens) AS INTEGER) AS sum_tokens
            FROM b GROUP BY bucket
        """,
        "graph1_tree_paths": """
            WITH RECURSIVE walk AS (
              SELECT c_custkey AS node, c_custkey AS cur,
                     CAST(0 AS INTEGER) AS d
              FROM customer
              UNION ALL
              SELECT node, cur // 10 AS cur, d + 1 FROM walk
              WHERE cur <> 0
            )
            SELECT node, CAST(0 AS BIGINT) AS root,
                   CAST(max(d) AS INTEGER) AS depth
            FROM walk GROUP BY node
        """,
        "agg1_ordered_listagg": """
            WITH y AS (
              SELECT DISTINCT o_orderpriority,
                     CAST(year(o_orderdate) AS INTEGER) AS yr
              FROM orders
            ),
            n AS (SELECT o_orderpriority, count(*) AS n_orders
                  FROM orders GROUP BY 1)
            SELECT y.o_orderpriority,
                   string_agg(CAST(yr AS VARCHAR), ',' ORDER BY yr)
                     AS active_years,
                   any_value(n.n_orders) AS n_orders
            FROM y JOIN n ON y.o_orderpriority = n.o_orderpriority
            GROUP BY y.o_orderpriority
        """,
        "arr1_token_sets": f"""
            WITH t AS (
              SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_distinct,
                   CAST(len(list_filter(toks,
                        x -> list_contains({_STOPWORD_SETS['en']}, x)))
                     AS INTEGER) AS n_stop,
                   CAST(len(list_distinct(list_concat(toks,
                        {_STOPWORD_SETS['en']}))) AS INTEGER) AS n_union,
                   CAST(len(list_filter(toks,
                        x -> NOT list_contains({_STOPWORD_SETS['en']}, x)))
                     AS INTEGER) AS n_content
            FROM t
        """,
        "funnel1_conversion": """
            WITH views AS (
              SELECT user_id, min(ts) AS first_view FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            clicks AS (
              SELECT e.user_id, min(e.ts) AS first_click
              FROM events e JOIN views v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts >= v.first_view
              GROUP BY e.user_id
            ),
            purch AS (
              SELECT e.user_id, min(e.ts) AS first_purchase
              FROM events e JOIN clicks c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
              GROUP BY e.user_id
            )
            SELECT v.user_id, v.first_view, c.first_click,
                   p.first_purchase,
                   CAST(1 + CASE WHEN c.first_click IS NOT NULL
                                 THEN 1 ELSE 0 END
                          + CASE WHEN p.first_purchase IS NOT NULL
                                 THEN 1 ELSE 0 END AS INTEGER)
                     AS stages_reached
            FROM views v
            LEFT JOIN clicks c ON v.user_id = c.user_id
            LEFT JOIN purch p ON v.user_id = p.user_id
        """,
        "retention1_cohorts": """
            WITH cohorts AS (
              SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
              FROM events WHERE event_type = 'signup' GROUP BY user_id
            ),
            active AS (
              SELECT e.user_id, c.cohort_week,
                     CAST(date_diff('day',
                            CAST(c.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) / 7
                          AS INTEGER) AS week_n
              FROM events e JOIN cohorts c ON e.user_id = c.user_id
            )
            SELECT CAST(cohort_week AS DATE) AS cohort_week, week_n,
                   count(DISTINCT user_id) AS active_users
            FROM active WHERE week_n >= 0
            GROUP BY 1, 2
        """,
        "st11_stream_ohlc": """
            SELECT date_trunc('hour', ts) AS bucket,
                   min_by(CAST(value AS DOUBLE),
                          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                     AS open,
                   max(CAST(value AS DOUBLE)) AS high,
                   min(CAST(value AS DOUBLE)) AS low,
                   max_by(CAST(value AS DOUBLE),
                          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                     AS close,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "ts5_ohlc_downsample": """
            SELECT date_trunc('hour', ts) AS bucket,
                   min_by(CAST(value AS DOUBLE),
                          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                     AS open,
                   max(CAST(value AS DOUBLE)) AS high,
                   min(CAST(value AS DOUBLE)) AS low,
                   max_by(CAST(value AS DOUBLE),
                          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                            || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                     AS close,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "dq3_volume_anomaly": """
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY 1
            ),
            med AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
            mad AS (
              SELECT any_value(m.med) AS med,
                     quantile_cont(abs(d.n - m.med), 0.5) AS mad
              FROM daily d, med m
            )
            SELECT d.day, CAST(d.n AS BIGINT) AS n,
                   CAST(CASE WHEN abs(CAST(d.n AS DOUBLE) - m.med)
                                  > 3.0 * m.mad
                             THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
            FROM daily d, mad m
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
        "mm4_resize_plan": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     CAST(320 + (doc_id % 7) * 160 AS BIGINT) AS w,
                     CAST(240 + (doc_id % 5) * 120 AS BIGINT) AS h,
                     encode(text) AS content
              FROM documents
            )
            SELECT media_id,
                   CAST(w AS INTEGER) AS width,
                   CAST(h AS INTEGER) AS height,
                   CAST((w * 224) // greatest(w, h) AS INTEGER) AS new_width,
                   CAST((h * 224) // greatest(w, h) AS INTEGER) AS new_height,
                   CAST(octet_length(content) AS BIGINT) AS n_bytes
            FROM m
        """,
        "udf1_pandas_parity": f"""
            SELECT doc_id, {_TOKEN_COUNT} AS n_tokens FROM documents
        """,
        "udtf2_word_offsets": """
            WITH ex AS (
              SELECT doc_id,
                     generate_subscripts(parts, 1) - 1 AS idx,
                     unnest(parts) AS word
              FROM (
                SELECT doc_id, string_split(text, ' ') AS parts
                FROM documents WHERE doc_id < 100
              )
            )
            SELECT doc_id, CAST(idx AS INT) AS idx, word,
                   CAST(coalesce(sum(length(word) + 1) OVER (
                     PARTITION BY doc_id ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS INT) AS char_offset
            FROM ex
        """,
        "st15_stream_temporal_enrich": """
            WITH dim AS (
              SELECT event_id AS dim_event_id, user_id, ts,
                     value AS dim_value
              FROM events WHERE event_type IN ('signup', 'purchase')
            ),
            iv AS (
              SELECT dim_event_id, user_id, dim_value,
                     ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, dim_event_id) AS valid_to
              FROM dim
            ),
            facts AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error'
            )
            SELECT f.event_id, f.user_id, f.ts,
                   i.dim_event_id, i.dim_value
            FROM facts f LEFT JOIN iv i
              ON i.user_id = f.user_id AND i.valid_from <= f.ts
                 AND (i.valid_to IS NULL OR f.ts < i.valid_to)
        """,
        "scd3_temporal_lookup": """
            WITH dim AS (
              SELECT event_id AS dim_event_id, user_id, ts,
                     value AS dim_value
              FROM events WHERE event_type IN ('signup', 'purchase')
            ),
            iv AS (
              SELECT dim_event_id, user_id, dim_value,
                     ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, dim_event_id) AS valid_to
              FROM dim
            ),
            facts AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error'
            )
            SELECT f.event_id, f.user_id, f.ts,
                   i.dim_event_id, i.dim_value
            FROM facts f LEFT JOIN iv i
              ON i.user_id = f.user_id AND i.valid_from <= f.ts
                 AND (i.valid_to IS NULL OR f.ts < i.valid_to)
        """,
        "j11_interval_overlap": """
            WITH base AS (
              SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS lo
              FROM events
            ),
            w AS (
              SELECT event_id AS win_id, lo AS w_lo, lo + 7200 AS w_hi
              FROM base WHERE event_id % 97 = 0
            ),
            a AS (
              SELECT event_id AS act_id, lo AS a_lo, lo + 1800 AS a_hi
              FROM base
            )
            SELECT w.win_id, a.act_id,
                   CAST(least(w.w_hi, a.a_hi)
                        - greatest(w.w_lo, a.a_lo) AS BIGINT) AS overlap_len
            FROM w JOIN a
              ON w.w_lo <= a.a_hi AND a.a_lo <= w.w_hi
            WHERE w.win_id <> a.act_id
        """,
        "geo2_grid_knn": """
            WITH pts AS (
              SELECT c_custkey AS pid,
                     CAST(c_custkey % 89 AS INTEGER) AS px,
                     CAST(c_custkey % 97 AS INTEGER) AS py
              FROM customer
            ),
            cand AS (
              SELECT a.pid, b.pid AS nn_id,
                     CAST((a.px - b.px) * (a.px - b.px)
                          + (a.py - b.py) * (a.py - b.py) AS BIGINT) AS d2
              FROM pts a JOIN pts b
                ON abs(a.px - b.px) <= 2 AND abs(a.py - b.py) <= 2
               AND a.pid <> b.pid
            )
            SELECT pid, nn_id, d2 FROM (
              SELECT pid, nn_id, d2,
                     row_number() OVER (PARTITION BY pid
                                        ORDER BY d2, nn_id) AS rn
              FROM cand
            ) WHERE rn = 1
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
        "geo1_grid_join": """
            WITH pts AS (
              SELECT c_custkey AS pid,
                     CAST(c_custkey % 89 AS INTEGER) AS px,
                     CAST(c_custkey % 97 AS INTEGER) AS py
              FROM customer
            )
            SELECT a.pid AS id_a, b.pid AS id_b,
                   b.px - a.px AS dx, b.py - a.py AS dy
            FROM pts a, pts b
            WHERE a.pid < b.pid
              AND abs(a.px - b.px) <= 1 AND abs(a.py - b.py) <= 1
        """,
        "fuzzy1_name_pairs": """
            WITH blocked AS (
              SELECT c_custkey AS id, c_name AS name,
                     substring(c_name, 1, length(c_name) - 1)
                       || '#' || CAST(length(c_name) AS VARCHAR) AS block
              FROM customer
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(levenshtein(a.name, b.name) AS INTEGER) AS distance
            FROM blocked a JOIN blocked b USING (block)
            WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 1
        """,
        "er1_entity_clusters": """
            WITH RECURSIVE blocked AS (
              SELECT c_custkey AS id, c_name AS name,
                     substring(c_name, 1, length(c_name) - 1)
                       || '#' || CAST(length(c_name) AS VARCHAR) AS block
              FROM customer
            ),
            pairs AS (
              SELECT a.id AS a, b.id AS b
              FROM blocked a JOIN blocked b USING (block)
              WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 1
            ),
            edges AS (
              SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
            ),
            reach(node, label) AS (
              SELECT DISTINCT a AS node, a AS label FROM edges
              UNION
              SELECT e.a AS node, r.label
              FROM edges e JOIN reach r ON r.node = e.b
            ),
            cc AS (
              SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
            ),
            members AS (
              SELECT coalesce(cc.cluster_id, c.c_custkey) AS entity_id
              FROM customer c LEFT JOIN cc ON c.c_custkey = cc.node
            )
            SELECT m.entity_id, CAST(count(*) AS INTEGER) AS n_members,
                   any_value(k.c_name) AS canonical_name
            FROM members m JOIN customer k ON k.c_custkey = m.entity_id
            GROUP BY m.entity_id
        """,
        "tp8_weighted_sample": f"""
            WITH w AS (
              SELECT doc_id,
                     CAST(least(n_chars * 20, 9000) AS INTEGER) AS weight_bp
              FROM documents
            )
            SELECT doc_id, weight_bp FROM w
            WHERE {_HASH32.format(x="'wsample:' || CAST(doc_id AS VARCHAR)")}
                    % 10000 < weight_bp
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
        "map1_props_map": """
            WITH pairs AS (
              SELECT unnest(json_keys(props)) AS key, props FROM events
            ),
            kv AS (
              SELECT key,
                     CAST(json_extract_string(props, '$.' || key) AS INTEGER)
                       AS value
              FROM pairs
            )
            SELECT key, value, CAST(count(*) AS INTEGER) AS n
            FROM kv GROUP BY key, value
        """,
    }


def spark_queries() -> dict[str, QueryFn]:
    return {
        "flagship_enriched_report": q_flagship,
        "p1_projection": q_p1_projection,
        "p2_star": q_p2_star,
        "p3_point_lookup": q_p3_point_lookup,
        "p4_null_health": q_p4_null_health,
        "p6_url_classify": q_p6_url_classify,
        "s2_watermark_prune": q_s2_watermark_prune,
        "j1_broadcast_join": q_j1_broadcast_join,
        "j2_emsstat_selfjoin": q_j2_emsstat_selfjoin,
        "j3_cache_antijoin": q_j3_cache_antijoin,
        "j5_weather_joinback": q_j5_weather_joinback,
        "j7_anti_join": q_j7_anti_join,
        "s6_idempotent_append": q_s6_idempotent_append,
        "a1_groupby_count": q_a1_groupby_count,
        "a3_watermark_max": q_a3_watermark_max,
        "a4_global_count": q_a4_global_count,
        "a6_distinct_single": q_a6_distinct_single,
        "a7_distinct_multi": q_a7_distinct_multi,
        "w1_frequency_rank": q_w1_frequency_rank,
        "j4_rank_joinback": q_j4_rank_joinback,
        "w3_window_max": q_w3_window_max,
        "f1_derivations": q_f1_derivations,
        "f5_date_format": q_f5_date_format,
        "f13_side_of_town": q_f13_side_of_town,
        "f15_element_at": q_f15_element_at,
        "topk_per_group": q_topk_per_group,
        "tpch_q1": q_tpch_q1,
        "sort_limit": q_sort_limit,
        "pivot": q_pivot,
        "rollup": q_rollup,
        "sessionization": q_sessionization,
        "window_tumbling": q_window_tumbling,
        "dd1_exact_dedup": q_dd1_exact_dedup,
        "dd2_minhash_bands": q_dd2_minhash_bands,
        "dd3_lsh_pairs": q_dd3_lsh_pairs,
        "dd4_simhash": q_dd4_simhash,
        "dd5_ngram_jaccard": q_dd5_ngram_jaccard,
        "dd15_containment": q_dd15_containment,
        "dd16_minhash_estimate": q_dd16_minhash_estimate,
        "dd5b_ngram_capped": q_dd5b_ngram_capped,
        "s5_pdf_parse": q_s5_pdf_parse,
        "s5b_pdf_decode": q_s5b_pdf_decode,
        "ta11_lm_quality": q_ta11_lm_quality,
        "ta14_seed_lm_quality": q_ta14_seed_lm_quality,
        "ta12_bpe_tokens": q_ta12_bpe_tokens,
        "ta13_lang_confusion": q_ta13_lang_confusion,
        "dd10_dedup_keeper": q_dd10_dedup_keeper,
        "dd11_segment_dedup": q_dd11_segment_dedup,
        "dd17_cdc_segments": q_dd17_cdc_segments,
        "dd18_intradoc_dedup": q_dd18_intradoc_dedup,
        "dd19_lsh_verified": q_dd19_lsh_verified,
        "dd12_incremental_lsh": q_dd12_incremental_lsh,
        "dd13_repeated_spans": q_dd13_repeated_spans,
        "dd13b_repeated_spans_sampled": q_dd13b_repeated_spans_sampled,
        "corpus_build2": q_corpus_build2,
        "corpus_report1": q_corpus_report1,
        "gr1_pagerank": q_gr1_pagerank,
        "gr3_hits": q_gr3_hits,
        "gr4_triangles": q_gr4_triangles,
        "gr5_label_prop": q_gr5_label_prop,
        "ts6_ewma": q_ts6_ewma,
        "gr2_pagerank_converged": q_gr2_pagerank_converged,
        "tok1_bpe_merges": q_tok1_bpe_merges,
        "tok2_bpe_encode": q_tok2_bpe_encode,
        "tok3_wordpiece_encode": q_tok3_wordpiece_encode,
        "tok4_bpe_sampled": q_tok4_bpe_sampled,
        "tok5_bpe_char_merges": q_tok5_bpe_char_merges,
        "tok6_bpe_char_encode": q_tok6_bpe_char_encode,
        "tok7_fertility_audit": q_tok7_fertility_audit,
        "corpus_build3": q_corpus_build3,
        "corpus_build4": q_corpus_build4,
        "corpus_refresh1": q_corpus_refresh1,
        "st7_stream_corpus_ingest": q_st7_stream_corpus_ingest,
        "tp10_budget_select": q_tp10_budget_select,
        "tp11_curriculum_order": q_tp11_curriculum_order,
        "tp12_temperature_sample": q_tp12_temperature_sample,
        "tp13_epoch_reshuffle": q_tp13_epoch_reshuffle,
        "tp14_domain_upsample": q_tp14_domain_upsample,
        "dc3_leakage_safe_split": q_dc3_leakage_safe_split,
        "st6_stream_lsh_probe": q_st6_stream_lsh_probe,
        "st8_stream_decontaminate": q_st8_stream_decontaminate,
        "ss6_quantize_int8": q_ss6_quantize_int8,
        "ss7_pq_codes": q_ss7_pq_codes,
        "ss8_pq_adc_topk": q_ss8_pq_adc_topk,
        "ss10_ivf_pq_search": q_ss10_ivf_pq_search,
        "ss11_recall_eval": q_ss11_recall_eval,
        "ss12_truncated_recall": q_ss12_truncated_recall,
        "ss13_filtered_ann": q_ss13_filtered_ann,
        "ss14_mmr_topk": q_ss14_mmr_topk,
        "dc5_semantic_decontaminate": q_dc5_semantic_decontaminate,
        "ss9_cluster_purity": q_ss9_cluster_purity,
        "ta1_token_count": q_ta1_token_count,
        "ta2_quality": q_ta2_quality,
        "ta3_lang_id": q_ta3_lang_id,
        "ta4_fingerprint": q_ta4_fingerprint,
        "ss1_ann_bruteforce": q_ss1_ann_bruteforce,
        "ss2_ivf_assign": q_ss2_ivf_assign,
        "ss3_ivf_topk": q_ss3_ivf_topk,
        "dd6_embed_cosine": q_dd6_embed_cosine,
        "dd7_embed_blocked": q_dd7_embed_blocked,
        "dd14_semdedup": q_dd14_semdedup,
        "mm1_media_features": q_mm1_media_features,
        "mm2_media_meta": q_mm2_media_meta,
        "st1_stream_tumbling": q_st1_stream_tumbling,
        "st13_stream_sliding": q_st13_stream_sliding,
        "st14_stream_phash_probe": q_st14_stream_phash_probe,
        "st17_stream_bloom_probe": q_st17_stream_bloom_probe,
        "st18_stream_word_hist": q_st18_stream_word_hist,
        "sk8_heavy_hitters": q_sk8_heavy_hitters,
        "st19_stream_heavy_hitters": q_st19_stream_heavy_hitters,
        "st15_stream_temporal_enrich": q_st15_stream_temporal_enrich,
        "st16_stream_quantile": q_st16_stream_quantile,
        "sk6_kmv_set_ops": q_sk6_kmv_set_ops,
        "sk7_quantile_sketch": q_sk7_quantile_sketch,
        "st2_stream_sessions": q_st2_stream_sessions,
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
        "cube": q_cube,
        "percentiles": q_percentiles,
        "set_ops": q_set_ops,
        "set_ops_all": q_set_ops_all,
        "j9_nullsafe_join": q_j9_nullsafe_join,
        "j11_interval_overlap": q_j11_interval_overlap,
        "cdc1_upsert_merge": q_cdc1_upsert_merge,
        "ts3_interval_merge": q_ts3_interval_merge,
        "ts4_cumulative_distinct": q_ts4_cumulative_distinct,
        "seq1_transitions": q_seq1_transitions,
        "seq2_cooccurrence": q_seq2_cooccurrence,
        "dq1_constraint_audit": q_dq1_constraint_audit,
        "ss4_hyperplane_lsh": q_ss4_hyperplane_lsh,
        "ss5_lsh_near_dup": q_ss5_lsh_near_dup,
        "stat5_winsorize": q_stat5_winsorize,
        "attr1_last_touch": q_attr1_last_touch,
        "dq2_profile": q_dq2_profile,
        "dq3_volume_anomaly": q_dq3_volume_anomaly,
        "ts5_ohlc_downsample": q_ts5_ohlc_downsample,
        "hist2_equidepth": q_hist2_equidepth,
        "tp9_mixture_sample": q_tp9_mixture_sample,
        "ta10_oov_rate": q_ta10_oov_rate,
        "st3_stream_static_join": q_st3_stream_static_join,
        "mm3_frame_sample": q_mm3_frame_sample,
        "json_extract": q_json_extract,
        "ta5_token_pieces": q_ta5_token_pieces,
        "dd8_simhash_pairs": q_dd8_simhash_pairs,
        "ta6_winnow": q_ta6_winnow,
        "a10_count_distinct": q_a10_count_distinct,
        "asof_join": q_asof_join,
        "asof2_forward": q_asof2_forward,
        "asof3_nearest": q_asof3_nearest,
        "asof4_tolerance": q_asof4_tolerance,
        "sk1_kmv_distinct": q_sk1_kmv_distinct,
        "sk4_hll_distinct": q_sk4_hll_distinct,
        "sk5_hll_rollup": q_sk5_hll_rollup,
        "st9_stream_hll": q_st9_stream_hll,
        "st10_stream_embed_probe": q_st10_stream_embed_probe,
        "st11_stream_ohlc": q_st11_stream_ohlc,
        "st12_stream_temperature_sample": q_st12_stream_temperature_sample,
        "range_join": q_range_join,
        "dd9_dup_clusters": q_dd9_dup_clusters,
        "scd2_intervals": q_scd2_intervals,
        "tp1_pack": q_tp1_pack,
        "tp2_stratified_sample": q_tp2_stratified_sample,
        "tp3_boilerplate_prune": q_tp3_boilerplate_prune,
        "tp4_shuffle_shards": q_tp4_shuffle_shards,
        "tp5_sliding_chunks": q_tp5_sliding_chunks,
        "tp6_group_sample": q_tp6_group_sample,
        "st4_stream_dedup": q_st4_stream_dedup,
        "st5_stream_stream_join": q_st5_stream_stream_join,
        "ta7_quality_filter": q_ta7_quality_filter,
        "inc_agg_merge": q_inc_agg_merge,
        "sql1_sql_api": q_sql1_sql_api,
        "corpus_build": q_corpus_build,
        "j8_full_outer": q_j8_full_outer,
        "ts1_gapfill": q_ts1_gapfill,
        "ts2_forward_fill": q_ts2_forward_fill,
        "ol1_zscore_outliers": q_ol1_zscore_outliers,
        "hist1_totalprice": q_hist1_totalprice,
        "stat1_corr": q_stat1_corr,
        "dc1_contamination": q_dc1_contamination,
        "dc6_flag_in_row": q_dc6_flag_in_row,
        "dc7_bloom_decontaminate": q_dc7_bloom_decontaminate,
        "dc8_scrub_spans": q_dc8_scrub_spans,
        "dc2_cross_snapshot": q_dc2_cross_snapshot,
        "dc4_overlap_fraction": q_dc4_overlap_fraction,
        "ta8_repetition": q_ta8_repetition,
        "ta9_pii_scrub": q_ta9_pii_scrub,
        "tfidf_top_terms": q_tfidf_top_terms,
        "ret1_bm25_topk": q_ret1_bm25_topk,
        "ret2_hybrid_rrf": q_ret2_hybrid_rrf,
        "wa1_lead_lag": q_wa1_lead_lag,
        "wa2_rolling": q_wa2_rolling,
        "wa3_range_frame": q_wa3_range_frame,
        "wa4_ntile": q_wa4_ntile,
        "wa8_dist_functions": q_wa8_dist_functions,
        "wa5_grouping_sets": q_wa5_grouping_sets,
        "wa6_unpivot": q_wa6_unpivot,
        "wa7_semi_join": q_wa7_semi_join,
        "sk2_bloom": q_sk2_bloom,
        "sk3_cms": q_sk3_cms,
        "tpch_q4": q_tpch_q4,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tp8_weighted_sample": q_tp8_weighted_sample,
        "geo1_grid_join": q_geo1_grid_join,
        "sj1_salted_hot_agg": q_sj1_salted_hot_agg,
        "sj2_salted_join": q_sj2_salted_join,
        "zo1_zorder_tiles": q_zo1_zorder_tiles,
        "geo2_grid_knn": q_geo2_grid_knn,
        "fuzzy1_name_pairs": q_fuzzy1_name_pairs,
        "er1_entity_clusters": q_er1_entity_clusters,
        "scd3_temporal_lookup": q_scd3_temporal_lookup,
        "udf1_pandas_parity": q_udf1_pandas_parity,
        "udtf2_word_offsets": q_udtf2_word_offsets,
        "mm4_resize_plan": q_mm4_resize_plan,
        "mm5_phash_neardup": q_mm5_phash_neardup,
        "stat2_mad": q_stat2_mad,
        "stat3_mode": q_stat3_mode,
        "stat4_gini": q_stat4_gini,
        "funnel1_conversion": q_funnel1_conversion,
        "retention1_cohorts": q_retention1_cohorts,
        "agg1_ordered_listagg": q_agg1_ordered_listagg,
        "arr1_token_sets": q_arr1_token_sets,
        "graph1_tree_paths": q_graph1_tree_paths,
        "tp7_length_buckets": q_tp7_length_buckets,
        "map1_props_map": q_map1_props_map,
    }
