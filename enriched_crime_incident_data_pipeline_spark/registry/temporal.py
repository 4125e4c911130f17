"""Time-centric operators: time series (ts*), as-of joins, range/interval joins, SCD, CDC, sessionization, tumbling windows, funnels, cohorts.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _MAX_CONCURRENCY_SQL,
    _SESSIONIZATION_SQL,
    _TUMBLING_SQL,
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


def q_seq4_session_paths(spark, sf_dir):
    # session-scoped path mining — the product-analytics report seq1's
    # global transition matrix can't answer ("what 3-step journeys do
    # sessions actually take"): sessionize with the standing 1800 s
    # gap rule, then count 3-step event-type paths WITHIN sessions
    # (lead×2 over the (user, session) partition — a path never
    # crosses a session boundary) and publish the top 10 with the
    # deterministic (count desc, path asc) tiebreak. The path domain
    # is |event_types|³ — tiny — so the final ordering is a
    # domain-bounded sort, never a row sort; everything upstream is
    # the one per-user window sessionization already pays.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
        ).over(w).alias("sess_id"),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    paths = sess.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(ws),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
        F.lead("event_type", 2).over(ws).alias("_p3"),
    ).filter(F.col("_p3").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


def q_seq3_collocations(spark, sf_dir):
    # collocation mining — the phrase-DISCOVERY artifact that feeds a
    # phrase query (ret7): top-20 adjacent token bigrams by lift =
    # P(ab)/(P(a)·P(b)), in exact integers — lift_bp = c_ab·N·10⁴
    # DIV (c_a·c_b) (the log-free PMI ordering; log is monotone, so
    # the ranking is PMI's). Bigrams are ROW-LOCAL (zip the token
    # array against its own tail — no window, no position join);
    # bigram and unigram counts are map-side groupBys; the two
    # unigram attach joins are token-domain; final top-20 is
    # TakeOrdered. Min support 5 keeps the lift denominator honest.
    docs = load_table(spark, sf_dir, "documents")
    from enriched_crime_incident_data_pipeline_spark.functions.text import (
        tokens as _tokens,
    )

    toks = docs.select(_tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("decimal(38,0)").alias("_n"))
    pairs = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    ).filter(F.col("c_ab") >= 5)
    dec = "decimal(38,0)"
    out = (
        pairs.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")),
            "w2",
        )
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.expr(
                f"CAST((CAST(c_ab AS {dec}) * _n * 10000)"
                f" DIV (CAST(c_a AS {dec}) * c_b) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )
    return out.orderBy(
        F.desc("lift_bp"), F.asc("w1"), F.asc("w2")
    ).limit(20)


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

def q_ts7_decayed_counts(spark, sf_dir):
    # exponentially time-decayed counts per event type at the
    # corpus watermark (now = max ts): each event weighs 2^-age_days
    # (capped at 30 days). The freshness-weighted frequency behind
    # feed ranking and crawl re-visit scheduling. EXACT despite the
    # float column: every weight is a negative power of two and every
    # partial sum is an integer multiple of 2^-30 far below 2^53, so
    # float64 addition never rounds and ANY summation order gives the
    # same bits - the plain map-side-combinable sum is cross-engine
    # bit-exact (no ordered fold needed).
    events = load_table(spark, sf_dir, "events")
    now = events.agg(F.max("ts").alias("_now"))
    wts = F.array(*[F.lit(w) for w in _TS7_WEIGHTS])
    aged = events.crossJoin(F.broadcast(now)).select(
        "event_type",
        F.least(
            F.datediff(F.to_date("_now"), F.to_date("ts")), F.lit(30)
        ).alias("_b"),
    )
    return (
        aged.select(
            "event_type", F.element_at(wts, F.col("_b") + 1).alias("_w")
        )
        .groupBy("event_type")
        .agg(
            F.sum("_w").alias("decayed"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


# 2^-b for b in 0..30: exactly representable doubles, emitted via
# repr() so the SQL literal list reproduces the identical bits
_TS7_WEIGHTS = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125, 0.00390625, 0.001953125, 0.0009765625, 0.00048828125, 0.000244140625, 0.0001220703125, 6.103515625e-05, 3.0517578125e-05, 1.52587890625e-05, 7.62939453125e-06, 3.814697265625e-06, 1.9073486328125e-06, 9.5367431640625e-07, 4.76837158203125e-07, 2.384185791015625e-07, 1.1920928955078125e-07, 5.960464477539063e-08, 2.9802322387695312e-08, 1.4901161193847656e-08, 7.450580596923828e-09, 3.725290298461914e-09, 1.862645149230957e-09, 9.313225746154785e-10]


def q_asof5_lastn(spark, sf_dir):
    # last-n-before join: for every event, the 2 most recent events
    # of the same user STRICTLY preceding it (total (ts, event_id)
    # order - no self/simultaneous matches) within a 30-minute
    # horizon. The bounded-lookback bucketing is what keeps this a
    # join (one shuffle of 2|R|+|L| bucket-keyed rows, top-n window
    # over in-horizon candidates only); the unbucketed LATERAL the
    # oracle runs fans out on long-lived keys and exists only as the
    # small-scale truth.
    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_topn,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = asof_topn(
        ev, ev, ["user_id"], "ts", "event_id", n=2, lookback_seconds=1800
    )
    return out.select(
        "event_id", "rank", "prev_event_id", "prev_event_type"
    )


def q_ts8_time_weighted_avg(spark, sf_dir):
    # time-weighted average per user — the sensor/finance mean that
    # weighs each reading by how LONG it was in effect (a value held
    # for an hour counts 3600x one held a second; the arithmetic mean
    # is wrong whenever sampling is irregular, which at 100 TB of
    # telemetry it always is). Exact cross-engine: values quantize to
    # integer milli-units FIRST (floor(v*1000) — the ss16/dq7 trick),
    # durations are integer epoch-second gaps to the next reading
    # (lead over (ts, event_id) — deterministic under ties), so both
    # sums are pure integers under any partitioning; output is the
    # sign-safe integer ratio in milli-units. One window + one
    # map-side-combinable groupBy, both on user_id — a single
    # shuffle; per-task memory is O(1) (lead, not collect). The last
    # reading per user has no successor and carries zero weight
    # (half-open interval convention); users whose total span is 0
    # are dropped (no time to average over).
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = "decimal(38,0)"
    e = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        F.floor(F.col("value") * F.lit(1000.0)).alias("vm"),
        F.lead(F.unix_timestamp("ts")).over(w).alias("tn"),
    )
    agg = (
        e.filter(F.col("tn").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                (F.col("tn") - F.col("t")).cast(dec)
                * F.col("vm").cast(dec)
            ).alias("num"),
            F.sum(F.col("tn") - F.col("t")).alias("den"),
        )
    )
    return agg.filter(F.col("den") > 0).select(
        "user_id",
        F.col("den").cast("bigint").alias("total_seconds"),
        F.expr(
            "CAST(CASE WHEN num < 0"
            " THEN -((-num) DIV CAST(den AS decimal(38,0)))"
            " ELSE num DIV CAST(den AS decimal(38,0)) END AS BIGINT)"
        ).alias("twa_milli"),
    )


def q_asof6_window_agg(spark, sf_dir):
    # point-in-time-correct feature computation (the feature-store
    # primitive): for every purchase, how many views — and their
    # milli-value sum — occurred in the strictly-preceding 30
    # minutes. The strictly-before total order means a label never
    # sees its own instant (leakage-safe by construction); zero-
    # history rows emit count 0 (a feature must exist for every
    # training row). Bucketed-equi-key shape per asof_window_agg.
    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_window_agg,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_window_agg(
        purchases, views, ["user_id"], "ts", "event_id", "value", 1800
    )
    return out.select("event_id", "user_id", "n_prev", "sum_prev_milli")


def q_cdc2_snapshot_diff(spark, sf_dir):
    # snapshot diff — the data-ops answer to "what changed since
    # the last run": per-user latest state (event_type, milli-value)
    # as of T1 = max(ts) − 1h vs T2 = max(ts), classified added /
    # changed / unchanged (removed cannot occur under append-only
    # ingestion, and its absence is part of the contract). Each
    # snapshot is ONE max_by aggregation (deterministic (ts,
    # event_id) tiebreak, the cdc1 idiom) — map-side combinable, no
    # per-user window over the event stream; the diff is a full
    # outer join co-partitioned on user_id; output is the status
    # histogram a pipeline posts to its run report — UP TO 3 rows:
    # a status with zero users emits no row (at sf0.01 only 2 rows
    # appear because no user is 'added'); consumers wanting a fixed
    # 3-row shape should left-join a literal status domain.
    ev = load_table(spark, sf_dir, "events")
    t2 = ev.agg(F.max(F.unix_timestamp("ts")).alias("_t2"))
    base = ev.crossJoin(F.broadcast(t2)).select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(1000.0)).alias("vm"),
        F.col("_t2"),
    )

    def snap(df, cutoff):
        return (
            df.filter(F.col("t") <= cutoff)
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct(
                        F.col("event_type").alias("et"),
                        F.col("vm").alias("vm"),
                    ),
                    F.struct(F.col("t"), F.col("event_id")),
                ).alias("st")
            )
        )

    s1 = snap(base, F.col("_t2") - 3600).select(
        "user_id", F.col("st").alias("s1")
    )
    s2 = snap(base, F.col("_t2")).select("user_id", F.col("st").alias("s2"))
    diff = s2.join(s1, "user_id", "left").select(
        F.when(F.col("s1").isNull(), "added")
        .when(
            (F.col("s1.et") == F.col("s2.et"))
            & (F.col("s1.vm") == F.col("s2.vm")),
            "unchanged",
        )
        .otherwise("changed")
        .alias("status")
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


def q_funnel2_time_bounded(spark, sf_dir):
    # funnel with per-stage deadlines — the product-analytics form
    # (an unbounded funnel credits a purchase months after the
    # click): first view → first click WITHIN 1h of it → first
    # purchase WITHIN 24h of that. Same scale shape as funnel1
    # (per-stage min-aggregations over conditional joins, every
    # shuffle on user_id — co-partitioned, no event-stream window);
    # the deadline is one extra row-local predicate per stage, and
    # a stage missing its window nulls everything downstream (the
    # join chain encodes that for free). Integer-second bounds.
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("ts") >= F.col("first_view"))
            & (
                F.unix_timestamp("ts")
                - F.unix_timestamp("first_view")
                <= 3600
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("ts") >= F.col("first_click"))
            & (
                F.unix_timestamp("ts")
                - F.unix_timestamp("first_click")
                <= 86400
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    funnel = views.join(clicks, "user_id", "left").join(
        purchases, "user_id", "left"
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


def q_ts11_seasonality_profile(spark, sf_dir):
    # the load-shape artifact capacity planning and anomaly baselines
    # read before any model: event counts per (day-of-week 1=Sunday,
    # hour-of-day) cell with each cell's traffic share in ppm
    # (integer; bp is too coarse when 168 cells' uniform share is
    # ~0.6%). ONE groupBy over the ≤168-cell domain; the share total
    # is a window over that domain relation, never the events. Pairs
    # with ts10 (gap shape) the way dq12 pairs with the ordering
    # contract: together they size sessionization and watermarks.
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cells.select(
        F.col("dow").cast("int").alias("dow"),
        F.col("hod").cast("int").alias("hod"),
        "n_events",
        F.sum("n_events").over(wall).alias("_tot"),
    ).select(
        "dow",
        "hod",
        "n_events",
        F.expr("CAST((n_events * 1000000) DIV _tot AS BIGINT)").alias(
            "share_ppm"
        ),
    )


def q_ts10_gap_histogram(spark, sf_dir):
    # the number sessionization's 1800 s threshold is TUNED on: the
    # per-user inter-event gap distribution as a log2-bucket
    # histogram with integer-bp shares and cumulative shares. Bucket
    # b holds gaps in [2^(b-1), 2^b) seconds (bucket 0 = simultaneous
    # events); the bucket index is length(bin(gap)) — pure integer,
    # engine-identical, no log(). One per-user lag window (the st2 /
    # sessionization partitioning) + a ≤40-row histogram groupBy; the
    # cumulative window runs over the histogram only (w1's trick),
    # never the event stream.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_timestamp("ts")
            - F.lag(F.unix_timestamp("ts")).over(w)
        ).alias("gap")
    ).filter(F.col("gap").isNotNull())
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        gap_histogram_report,
    )

    hist = (
        gaps.select(
            F.when(F.col("gap") <= 0, F.lit(0))
            .otherwise(F.length(F.expr("bin(gap)")))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
    )
    return gap_histogram_report(hist)


def q_ts9_max_concurrency(spark, sf_dir):
    # peak concurrent sessions per user — the capacity-planning
    # statistic: each event opens a half-open 30-min interval
    # [ts, ts+1800s) (the ts3 convention) and the sweep-line running
    # sum's maximum is the answer. Exact integers end-to-end; one
    # hash shuffle by user_id (window + reuse-partitioned groupBy);
    # peak extracted via max(struct(run, -t)) — no join-back, no
    # second window. Half-open semantics pinned by ordering -1
    # deltas before +1 at equal t.
    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        max_concurrency,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(1800000000).cast("long")).alias("e"),
    )
    return max_concurrency(iv, ["user_id"], "s", "e").withColumnRenamed(
        "peak_at", "peak_at_us"
    )


def q_ts13_burstiness_profile(spark, sf_dir):
    # the BURSTINESS artifact (r10; ts11 located the seasonal peaks,
    # ts12 measured cycle strength — this measures dispersion: a
    # Poisson-like arrival stream has Fano factor ~1, bursty traffic
    # >>1, and the number sizes stream micro-batch buffers and
    # rate-limiter headroom): per day-of-week, the variance-to-mean
    # ratio of the hourly event-count series, in EXACT integer
    # micro-units — F = (n*sum(c^2) - (sum c)^2) / (n * sum c), both
    # sides BIGINT, emitted as (num * 1e6) DIV den. One groupBy over
    # the <=|hours| bucket domain, one over the <=7 dow domain; no
    # floats anywhere.
    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.expr("unix_timestamp(ts) DIV 3600").alias("h")
    ).groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # dow of the bucket: hour-index -> day-index; unix epoch day 0
    # (1970-01-01) was a Thursday = 5 in the 1=Sunday convention
    dowed = series.select(
        (F.expr("h DIV 24") + F.lit(4)).alias("_d"),
        "c",
    ).select(
        ((F.col("_d") % 7) + 1).cast("int").alias("dow"),
        "c",
    )
    g = dowed.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("_sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("_scc"),
    )
    return g.select(
        "dow",
        "n_hours",
        F.col("_sc").alias("n_events"),
        F.expr(
            "CAST(((n_hours * _scc - _sc * _sc) * 1000000)"
            " DIV (n_hours * _sc) AS BIGINT)"
        ).alias("fano_micro"),
    )


def q_ts12_autocorr_profile(spark, sf_dir):
    # the seasonality-STRENGTH artifact (r10; ts11 located the
    # (dow, hour) peaks, this measures how predictive the cycle is):
    # Pearson autocorrelation of the hourly event-count series at
    # lags 1 h / 24 h / 168 h — the numbers that justify daily/weekly
    # capacity models and drift-detector window lengths. The series
    # is one groupBy over the ≤|hours| bucket domain; one self-join
    # on (hour + lag) with the 3 lags exploded on the left side
    # (pairs exist where BOTH hours observed — absent hours are
    # missing data, not zeros; stated semantics); co-moments are
    # EXACT BIGINT sums of count products (counts are integers — no
    # decimal needed), then one fixed float chain per lag (stat1's
    # discipline: identical op sequence in the oracle, bit-equal).
    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.expr("unix_timestamp(ts) DIV 3600").alias("h")
    ).groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lagged = series.select(
        F.explode(F.array(F.lit(1), F.lit(24), F.lit(168))).alias("lag"),
        (F.col("h")).alias("h0"),
        F.col("c").alias("x"),
    ).withColumn("h2", F.col("h0") + F.col("lag"))
    joined = lagged.join(
        series.select(F.col("h").alias("h2"), F.col("c").alias("y")), "h2"
    )
    g = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("x").cast("bigint").alias("_sx"),
        F.sum("y").cast("bigint").alias("_sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("_syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("_sxy"),
    )
    n = F.col("n_pairs").cast("double")
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = n * d("_sxy") - d("_sx") * d("_sy")
    den = F.sqrt(
        (n * d("_sxx") - d("_sx") * d("_sx"))
        * (n * d("_syy") - d("_sy") * d("_sy"))
    )
    return g.select(
        F.col("lag").cast("int").alias("lag_hours"),
        "n_pairs",
        (num / den).alias("autocorr"),
    )


def q_ts14_changepoint_profile(spark, sf_dir):
    # the CHANGE-POINT magnitude profile (r10; ts11 shows the stable
    # weekly shape, ts13 the dispersion — this finds the LEVEL SHIFT:
    # did a feed break or a backfill land mid-series?). Classic CUSUM
    # against the per-type mean, in exact integers: with N days and
    # total T, the scaled cumulative deviation at day k is
    # s_k = N·cum_k − k·T (= N·Σ(x_i − T/N) without ever forming the
    # fractional mean); the profile row per event_type is max|s_k|,
    # its day (ties → earliest), and the magnitude normalized by the
    # series mass in bp. Zero-filled day spine (a missing day IS a
    # deviation), one bounded-domain groupBy, then windows over the
    # |types|×|days| spine only — never over raw event rows.
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(days))
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("x", F.lit(0)).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    cur = filled.select(
        "event_type",
        "day",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).alias("k"),
        F.sum("x").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("nd"),
    )
    s = cur.select(
        "event_type",
        "day",
        "nd",
        "tot",
        F.abs(F.col("nd") * F.col("cum") - F.col("k") * F.col("tot")).alias(
            "abs_s"
        ),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("abs_s").desc(), F.col("day")
            )
        ),
    )
    return s.filter(F.col("_rn") == 1).select(
        "event_type",
        F.col("nd").cast("bigint").alias("n_days"),
        F.col("tot").cast("bigint").alias("total_events"),
        F.col("abs_s").cast("bigint").alias("cusum_max"),
        F.expr(
            "CAST(CASE WHEN tot = 0 THEN 0"
            " ELSE (abs_s * 10000) DIV (nd * tot) END AS BIGINT)"
        ).alias("cusum_max_bp"),
        F.col("day").alias("changepoint_day"),
    )


QUERIES = {
    "ts14_changepoint_profile": q_ts14_changepoint_profile,
    "ts12_autocorr_profile": q_ts12_autocorr_profile,
    "ts13_burstiness_profile": q_ts13_burstiness_profile,
    "ts10_gap_histogram": q_ts10_gap_histogram,
    "ts11_seasonality_profile": q_ts11_seasonality_profile,
    "cdc2_snapshot_diff": q_cdc2_snapshot_diff,
    "asof6_window_agg": q_asof6_window_agg,
    "funnel2_time_bounded": q_funnel2_time_bounded,
    "ts9_max_concurrency": q_ts9_max_concurrency,
    "ts8_time_weighted_avg": q_ts8_time_weighted_avg,
    "asof5_lastn": q_asof5_lastn,
    "ts7_decayed_counts": q_ts7_decayed_counts,
    "sessionization": q_sessionization,
    "window_tumbling": q_window_tumbling,
    "ts6_ewma": q_ts6_ewma,
    "cdc1_upsert_merge": q_cdc1_upsert_merge,
    "ts3_interval_merge": q_ts3_interval_merge,
    "ts4_cumulative_distinct": q_ts4_cumulative_distinct,
    "seq1_transitions": q_seq1_transitions,
    "seq4_session_paths": q_seq4_session_paths,
    "seq3_collocations": q_seq3_collocations,
    "seq2_cooccurrence": q_seq2_cooccurrence,
    "attr1_last_touch": q_attr1_last_touch,
    "ts5_ohlc_downsample": q_ts5_ohlc_downsample,
    "asof_join": q_asof_join,
    "asof2_forward": q_asof2_forward,
    "asof3_nearest": q_asof3_nearest,
    "asof4_tolerance": q_asof4_tolerance,
    "range_join": q_range_join,
    "scd2_intervals": q_scd2_intervals,
    "ts1_gapfill": q_ts1_gapfill,
    "ts2_forward_fill": q_ts2_forward_fill,
    "scd3_temporal_lookup": q_scd3_temporal_lookup,
    "funnel1_conversion": q_funnel1_conversion,
}

def oracles() -> dict[str, str]:
    return {
        "ts14_changepoint_profile": """
            WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS x
              FROM events GROUP BY 1, 2
            ),
            days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
            types AS (SELECT DISTINCT event_type FROM events),
            filled AS (
              SELECT t.event_type, d.day, coalesce(dl.x, 0) AS x
              FROM types t CROSS JOIN days d
              LEFT JOIN daily dl
                ON dl.event_type = t.event_type AND dl.day = d.day
            ),
            cur AS (
              SELECT event_type, day,
                     sum(x) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) AS k,
                     sum(x) OVER (PARTITION BY event_type) AS tot,
                     count(*) OVER (PARTITION BY event_type) AS nd
              FROM filled
            ),
            s AS (
              SELECT event_type, day, nd, tot,
                     abs(nd * cum - k * tot) AS abs_s,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(nd * cum - k * tot) DESC, day) AS rn
              FROM cur
            )
            SELECT event_type,
                   CAST(nd AS BIGINT) AS n_days,
                   CAST(tot AS BIGINT) AS total_events,
                   CAST(abs_s AS BIGINT) AS cusum_max,
                   CAST(CASE WHEN tot = 0 THEN 0
                        ELSE (abs_s * 10000) // (nd * tot) END AS BIGINT)
                     AS cusum_max_bp,
                   day AS changepoint_day
            FROM s WHERE rn = 1
""",
        "ts13_burstiness_profile": """
            WITH s AS (
              SELECT epoch_us(ts) // 1000000 // 3600 AS h,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1
            ),
            d AS (
              SELECT CAST(((h // 24 + 4) % 7) + 1 AS INTEGER) AS dow, c
              FROM s
            ),
            g AS (
              SELECT dow,
                     CAST(count(*) AS BIGINT) AS n_hours,
                     CAST(sum(c) AS BIGINT) AS sc,
                     CAST(sum(c * c) AS BIGINT) AS scc
              FROM d GROUP BY dow
            )
            SELECT dow, n_hours, sc AS n_events,
                   CAST(((n_hours * scc - sc * sc) * 1000000)
                        // (n_hours * sc) AS BIGINT) AS fano_micro
            FROM g
""",
        "ts12_autocorr_profile": """
            WITH s AS (
              SELECT epoch_us(ts) // 1000000 // 3600 AS h,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1
            ),
            lags(lag) AS (VALUES (1), (24), (168)),
            j AS (
              SELECT lags.lag, a.c AS x, b.c AS y
              FROM s a CROSS JOIN lags
              JOIN s b ON b.h = a.h + lags.lag
            ),
            g AS (
              SELECT lag,
                     CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM j GROUP BY lag
            )
            SELECT CAST(lag AS INTEGER) AS lag_hours, n_pairs,
                   (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                     AS autocorr
            FROM g
""",
        "ts11_seasonality_profile": """
            WITH cells AS (
              SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2
            )
            SELECT CAST(dow AS INTEGER) AS dow, CAST(hod AS INTEGER) AS hod,
                   n_events,
                   CAST((n_events * 1000000) // (sum(n_events) OVER ())
                     AS BIGINT) AS share_ppm
            FROM cells
""",
        "ts10_gap_histogram": """
            WITH g AS (
              SELECT epoch_us(ts) // 1000000
                     - lag(epoch_us(ts) // 1000000) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                       ) AS gap
              FROM events
            ),
            b AS (
              SELECT CASE WHEN gap <= 0 THEN 0
                          ELSE length(bin(gap)) END AS bucket
              FROM g WHERE gap IS NOT NULL
            ),
            hist AS (
              SELECT CAST(bucket AS INTEGER) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_gaps
              FROM b GROUP BY bucket
            ),
            t AS (SELECT sum(n_gaps) AS tot FROM hist)
            SELECT bucket,
                   CAST(CASE WHEN bucket = 0 THEN 0
                        ELSE (1::BIGINT << (bucket - 1)) END AS BIGINT)
                     AS lo_sec,
                   n_gaps,
                   CAST((n_gaps * 10000) // tot AS BIGINT) AS share_bp,
                   CAST((sum(n_gaps) OVER (ORDER BY bucket ROWS BETWEEN
                        UNBOUNDED PRECEDING AND CURRENT ROW) * 10000) // tot
                     AS BIGINT) AS cum_bp
            FROM hist, t
""",

        "asof5_lastn": """
                    SELECT l.event_id, CAST(r.rank AS INTEGER) AS rank,
                           r.prev_event_id, r.prev_event_type
                    FROM events l, LATERAL (
                      SELECT row_number() OVER (
                               ORDER BY ts DESC, event_id DESC) AS rank,
                             event_id AS prev_event_id,
                             event_type AS prev_event_type
                      FROM events r
                      WHERE r.user_id = l.user_id
                        AND (r.ts < l.ts
                             OR (r.ts = l.ts AND r.event_id < l.event_id))
                        AND r.ts >= l.ts - INTERVAL 1800 SECONDS
                      ORDER BY ts DESC, event_id DESC LIMIT 2
                    ) r
                """,
        "ts9_max_concurrency": _MAX_CONCURRENCY_SQL,
        "seq3_collocations": """
            WITH norm AS (
              SELECT string_split_regex(
                       trim(regexp_replace(lower(text),
                            '[^a-z0-9]+', ' ', 'g')), ' +') AS ts
              FROM documents
              WHERE trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')) <> ''
            ),
            pos AS (
              SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
              FROM norm WHERE len(ts) >= 2
            ),
            bg AS (
              SELECT ts[i] AS w1, ts[i + 1] AS w2,
                     count(*) AS c_ab
              FROM pos GROUP BY 1, 2 HAVING count(*) >= 5
            ),
            uni AS (
              SELECT w, count(*) AS c FROM (
                SELECT unnest(ts) AS w FROM norm
              ) WHERE w <> '' GROUP BY 1
            ),
            n AS (SELECT CAST(sum(c) AS HUGEINT) AS nt FROM uni)
            SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
                   CAST((CAST(c_ab AS HUGEINT) * nt * 10000)
                        // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT)
                     AS lift_bp
            FROM bg
            JOIN uni a ON a.w = bg.w1
            JOIN uni b ON b.w = bg.w2
            CROSS JOIN n
            ORDER BY lift_bp DESC, w1, w2 LIMIT 20
""",
        "asof6_window_agg": """
                    WITH l AS (
                      SELECT event_id, user_id, ts FROM events
                      WHERE event_type = 'purchase'
                    ),
                    r AS (
                      SELECT event_id, user_id, ts,
                             CAST(floor(value * 1000) AS BIGINT) AS vm
                      FROM events WHERE event_type = 'view'
                    ),
                    agg AS (
                      SELECT l.event_id AS eid,
                             count(*) AS n_prev,
                             sum(r.vm) AS sum_prev
                      FROM l JOIN r ON r.user_id = l.user_id
                       AND (r.ts < l.ts
                            OR (r.ts = l.ts AND r.event_id < l.event_id))
                       AND epoch_us(r.ts) >= epoch_us(l.ts) - 1800000000
                      GROUP BY 1
                    )
                    SELECT l.event_id, l.user_id,
                           CAST(coalesce(a.n_prev, 0) AS BIGINT) AS n_prev,
                           CAST(coalesce(a.sum_prev, 0) AS BIGINT)
                             AS sum_prev_milli
                    FROM l LEFT JOIN agg a ON a.eid = l.event_id
                """,
        "cdc2_snapshot_diff": """
                    WITH t2 AS (
                      SELECT max(epoch_us(ts) // 1000000) AS t2 FROM events
                    ),
                    base AS (
                      SELECT user_id, epoch_us(ts) // 1000000 AS t,
                             event_id, event_type,
                             CAST(floor(value * 1000) AS BIGINT) AS vm,
                             t2.t2
                      FROM events, t2
                    ),
                    s1 AS (
                      SELECT user_id, event_type AS et1, vm AS vm1 FROM (
                        SELECT *, row_number() OVER (
                          PARTITION BY user_id
                          ORDER BY t DESC, event_id DESC) AS rn
                        FROM base WHERE t <= t2 - 3600
                      ) WHERE rn = 1
                    ),
                    s2 AS (
                      SELECT user_id, event_type AS et2, vm AS vm2 FROM (
                        SELECT *, row_number() OVER (
                          PARTITION BY user_id
                          ORDER BY t DESC, event_id DESC) AS rn
                        FROM base WHERE t <= t2
                      ) WHERE rn = 1
                    )
                    SELECT status, CAST(count(*) AS BIGINT) AS n_users
                    FROM (
                      SELECT CASE
                        WHEN s1.user_id IS NULL THEN 'added'
                        WHEN s1.et1 = s2.et2 AND s1.vm1 = s2.vm2
                          THEN 'unchanged'
                        ELSE 'changed' END AS status
                      FROM s2 LEFT JOIN s1 USING (user_id)
                    ) GROUP BY status
                """,
        "funnel2_time_bounded": """
                    WITH views AS (
                      SELECT user_id, min(ts) AS first_view FROM events
                      WHERE event_type = 'view' GROUP BY user_id
                    ),
                    clicks AS (
                      SELECT e.user_id, min(e.ts) AS first_click
                      FROM events e JOIN views v ON e.user_id = v.user_id
                      WHERE e.event_type = 'click' AND e.ts >= v.first_view
                        AND epoch_us(e.ts) // 1000000
                            - epoch_us(v.first_view) // 1000000 <= 3600
                      GROUP BY e.user_id
                    ),
                    purch AS (
                      SELECT e.user_id, min(e.ts) AS first_purchase
                      FROM events e JOIN clicks c ON e.user_id = c.user_id
                      WHERE e.event_type = 'purchase'
                        AND e.ts >= c.first_click
                        AND epoch_us(e.ts) // 1000000
                            - epoch_us(c.first_click) // 1000000 <= 86400
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
        "ts8_time_weighted_avg": """
            WITH e AS (
              SELECT user_id,
                     epoch_us(ts) // 1000000 AS t,
                     CAST(floor(value * 1000) AS BIGINT) AS vm,
                     lead(epoch_us(ts) // 1000000) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS tn
              FROM events
            ),
            agg AS (
              SELECT user_id,
                     SUM(CAST(tn - t AS HUGEINT) * vm) AS num,
                     SUM(tn - t) AS den
              FROM e WHERE tn IS NOT NULL GROUP BY 1
            )
            SELECT user_id,
                   CAST(den AS BIGINT) AS total_seconds,
                   CAST(CASE WHEN num < 0
                        THEN -((-num) // CAST(den AS HUGEINT))
                        ELSE num // CAST(den AS HUGEINT) END
                     AS BIGINT) AS twa_milli
            FROM agg WHERE den > 0
""",
        "ts7_decayed_counts": """
                    WITH now_t AS (SELECT max(ts) AS now FROM events),
                    aged AS (
                      SELECT event_type,
                             least(date_diff('day', CAST(ts AS DATE),
                                             CAST(now AS DATE)), 30) AS b
                      FROM events, now_t
                    )
                    SELECT event_type,
                           sum(([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.0078125, 0.00390625, 0.001953125, 0.0009765625, 0.00048828125, 0.000244140625, 0.0001220703125, 6.103515625e-05, 3.0517578125e-05, 1.52587890625e-05, 7.62939453125e-06, 3.814697265625e-06, 1.9073486328125e-06, 9.5367431640625e-07, 4.76837158203125e-07, 2.384185791015625e-07, 1.1920928955078125e-07, 5.960464477539063e-08, 2.9802322387695312e-08, 1.4901161193847656e-08, 7.450580596923828e-09, 3.725290298461914e-09, 1.862645149230957e-09, 9.313225746154785e-10])[b + 1]) AS decayed,
                           CAST(count(*) AS BIGINT) AS n_events
                    FROM aged GROUP BY event_type
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
        "seq4_session_paths": """
            WITH flagged AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(epoch_us(ts) // 1000000) OVER w IS NULL
                               OR epoch_us(ts) // 1000000
                                  - lag(epoch_us(ts) // 1000000) OVER w > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
              SELECT user_id, ts, event_id, event_type,
                     sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS sess_id
              FROM flagged
            ),
            paths AS (
              SELECT event_type || '>' || lead(event_type, 1) OVER ws
                     || '>' || lead(event_type, 2) OVER ws AS path,
                     lead(event_type, 2) OVER ws AS p3
              FROM sess
              WINDOW ws AS (PARTITION BY user_id, sess_id
                            ORDER BY ts, event_id)
            )
            SELECT path, CAST(count(*) AS BIGINT) AS n
            FROM paths WHERE p3 IS NOT NULL
            GROUP BY path ORDER BY n DESC, path LIMIT 10
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
        "sessionization": _SESSIONIZATION_SQL,
        "window_tumbling": _TUMBLING_SQL,
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
        "range_join": """
                    SELECT c_custkey, p_partkey, c_acctbal, p_retailprice
                    FROM customer JOIN part
                      ON c_acctbal >= p_retailprice
                     AND c_acctbal < p_retailprice + p_size / 100.0
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
        "ts6_ewma": """
                    SELECT user_id,
                           CAST(count(*) AS INTEGER) AS n_events,
                           list_reduce(list(value ORDER BY ts, event_id),
                                       (acc, x) -> acc + (x - acc) / 4.0) AS ewma
                    FROM events GROUP BY user_id
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
    }
