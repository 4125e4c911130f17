"""Streaming flagship: incremental file-stream ingest → key-deduped
date-partitioned gold → batch enrichment view, equal to the batch
pipeline on the same data (plans/streaming_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.operators.dedup import dedup_by_key
from enriched_crime_incident_data_pipeline_spark.operators.derive import to_silver
from enriched_crime_incident_data_pipeline_spark.plans import (
    events_as_incidents_raw,
    synthetic_location_dim,
    synthetic_weather_hourly,
)
from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.plans.pipeline import (
    enrich_incidents,
)
from enriched_crime_incident_data_pipeline_spark.plans.streaming_pipeline import (
    enriched_view,
    ingest_silver_to_gold,
    silver_stream,
)
from enriched_crime_incident_data_pipeline_spark.sinks.output import (
    gold_projection,
)
from enriched_crime_incident_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_ingest_equals_batch_pipeline(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "arrivals")
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    # wave A: first 600 events arrive as one file
    events.filter(F.col("event_id") < 600).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = spark.read.parquet(src).schema

    def run_ingest():
        stream = spark.readStream.schema(schema).parquet(src)
        ingest_silver_to_gold(silver_stream(stream), gold, ckpt)

    run_ingest()
    assert spark.read.parquet(gold).count() == 600

    # wave B overlaps A by 200 keys — the at-least-once reality the
    # key dedup (reference's ON CONFLICT) must absorb
    events.filter(F.col("event_id") >= 400).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_ingest()
    out = spark.read.parquet(gold)
    assert out.count() == events.count()  # overlap deduped, nothing lost
    assert out.select("incident_num").distinct().count() == events.count()
    # gold is date-partitioned (hive directories)
    assert out.select("incident_date").distinct().count() > 1

    # the enrichment view over streaming-built gold ≡ the batch DAG
    dim = synthetic_location_dim(events)
    batch_silver = dedup_by_key(
        to_silver(events_as_incidents_raw(events)), "incident_num"
    )
    wh = synthetic_weather_hourly(with_coordinates(batch_silver, dim))
    want = gold_projection(enrich_incidents(batch_silver, dim, wh))
    got = gold_projection(enriched_view(spark, gold, dim, wh))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_st21_stream_asof_equals_batch_asof_join(spark):
    # AvailableNow ≡ the batch asof_join with the same 30-minute
    # tolerance — the r7 "last batch-only family" closure, pinned
    # end-to-end through the registry entry
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_join,
    )
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in spark_queries()["st21_stream_asof"](spark, sf_dir).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    want = sorted(
        tuple(r)
        for r in asof_join(
            purchases,
            views,
            ["user_id"],
            "ts",
            "event_id",
            tolerance=F.expr("INTERVAL 30 MINUTES"),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof_event_id").alias("view_event_id"),
            F.col("asof_value").alias("view_value"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_st22_multibatch_state_merge_equals_batch_tp15(spark, tmp_path):
    # the mergeability claim under REAL incremental state: documents
    # arrive as 3 separate files processed one per micro-batch
    # (maxFilesPerTrigger=1), the per-salt top-k state merges across
    # batches, and the finalized sample equals the batch
    # weighted_sample_k over the union — row-for-row, keys included
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        es_key_exprs,
        weighted_sample_k,
    )
    from enriched_crime_incident_data_pipeline_spark.functions.text import (
        token_count,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        finalize_weighted_sample,
        run_available_now,
        stream_weighted_sample,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "arrivals")
    for lo, hi in [(0, 170), (170, 340), (340, 10_000)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tier_in = F.floor(token_count(F.col("text")) / 64).cast("int")
    t, key = es_key_exprs(tier_in)
    keyed = stream.select("doc_id", t.alias("tier"), key.alias("es_key"))
    emitted = run_available_now(
        stream_weighted_sample(keyed, k=25),
        "st22_multibatch_test",
        "update",
        state_partitions=4,
    )
    # ≥2 generations for at least one salt proves multi-batch merging
    assert emitted.agg(F.max("gen")).collect()[0][0] >= 2
    got = [
        tuple(r)
        for r in finalize_weighted_sample(emitted, k=25).collect()
    ]
    want = [
        tuple(r)
        for r in weighted_sample_k(docs, 25, tier_in)
        .orderBy(F.col("es_key").desc(), "doc_id")
        .collect()
    ]
    assert got == want and len(got) == 25


def test_st23_stream_ks_drift_equals_batch_dq7(spark):
    # AvailableNow ≡ batch: the streaming monitor maintains the
    # per-(source, value) histogram as state and runs the identical
    # exact-KS epilogue, so the bounded run must equal dq7's batch
    # answer row-for-row — pinned end-to-end through the registry
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    sf_dir = "/root/testdata/sf0.001"
    qs = spark_queries()
    got = sorted(
        tuple(r) for r in qs["st23_stream_ks_drift"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in qs["dq7_ks_drift"](spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


def test_st24_stream_concurrency_equals_batch_ts9(spark):
    # AvailableNow ≡ batch: the streaming monitor maintains the
    # per-(user, instant) net-delta histogram as state (arrival-order
    # free — integer deltas merge in any micro-batch order) and runs
    # the identical sweep epilogue, so the bounded run must equal
    # ts9's batch answer row-for-row — pinned end-to-end through the
    # registry
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    sf_dir = "/root/testdata/sf0.001"
    qs = spark_queries()
    got = sorted(
        tuple(r)
        for r in qs["st24_stream_concurrency"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in qs["ts9_max_concurrency"](spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


def test_st25_stream_trend_equals_batch_stat6(spark):
    # AvailableNow ≡ batch: the streaming monitor maintains the five
    # co-moment sums as state with UN-rebased x while batch stat6
    # re-bases x against the global min — integer shift-invariance
    # (trend_from_moments docstring) makes the outputs bit-identical,
    # pinned end-to-end through the registry
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    sf_dir = "/root/testdata/sf0.001"
    qs = spark_queries()
    got = sorted(
        tuple(r) for r in qs["st25_stream_trend"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in qs["stat6_linear_trend"](spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


def test_st26_session_window_touch_boundary(spark):
    """Native session_window gap semantics pinned empirically (this
    fixture is how the oracle's tie rule was DISCOVERED): Spark
    merges windows that overlap or TOUCH, so an exact-30min gap
    still merges and only a strictly larger gap splits; the merged
    session's end is last_ts + 30 min."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: exact 1800s gap -> TOUCHING windows merge
        (1, t0, 1, "view", 1.0),
        (2, t0 + dt.timedelta(seconds=1800), 1, "view", 2.0),
        # user 2: 1801s gap -> two sessions
        (3, t0, 2, "view", 3.0),
        (4, t0 + dt.timedelta(seconds=1801), 2, "view", 4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    d = tempfile.mkdtemp()
    # stage a single parquet FILE: the staged file source symlinks
    # <dir>/events.parquet itself, and treats each file as an
    # arriving batch — a multi-file fixture would also let the
    # watermark late-drop the older rows of a later batch
    tmp_out = os.path.join(d, "_ev")
    df.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(d, "events.parquet"))
    out = spark_queries()["st26_stream_session_window"](spark, d).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    (s1,) = by_user[1]
    assert s1["n_events"] == 2 and s1["total_value"] == 3.0
    assert s1["session_end"] == t0 + dt.timedelta(seconds=1800 + 1800)
    assert len(by_user[2]) == 2


def test_st27_stream_mixture_equals_batch_tp16(spark):
    # AvailableNow ≡ batch: the streaming monitor maintains the
    # per-stratum counts as state and runs the identical
    # three-temperature epilogue, pinned end-to-end through the
    # registry
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    sf_dir = "/root/testdata/sf0.001"
    qs = spark_queries()
    got = sorted(
        tuple(r) for r in qs["st27_stream_mixture"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in qs["tp16_mixture_curve"](spark, sf_dir).collect()
    )
    assert got == want and len(got) == 9


def test_st30_multibatch_gap_state_equals_batch_ts10(spark, tmp_path):
    # gaps that SPAN micro-batch boundaries must fold against the
    # carried last_ts, not restart: events arrive as 3 time-ordered
    # files (maxFilesPerTrigger=1) and the finalized histogram must
    # equal batch ts10 over the union row-for-row.
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        finalize_gap_histogram,
        run_available_now,
        stream_gap_buckets,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    cuts = [r[0] for r in ev.select(
        F.expr("percentile(unix_timestamp(ts), array(0.33, 0.66))")
    ).collect()][0]
    src = str(tmp_path / "arrivals")
    parts = [
        ev.filter(F.unix_timestamp("ts") <= F.lit(int(cuts[0]))),
        ev.filter(
            (F.unix_timestamp("ts") > F.lit(int(cuts[0])))
            & (F.unix_timestamp("ts") <= F.lit(int(cuts[1])))
        ),
        ev.filter(F.unix_timestamp("ts") > F.lit(int(cuts[1]))),
    ]
    import os
    import time as _time

    os.makedirs(src)
    for i, p in enumerate(parts):
        d = os.path.join(src, f"b{i}.parquet")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        t = 1_000_000_000 + i
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(d, (t, t))
    schema = spark.read.parquet(src + "/b0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    emitted = run_available_now(
        stream_gap_buckets(stream), "st30_multibatch_test", "update",
        state_partitions=4,
    )
    # >=2 generations proves multi-batch state merging actually ran
    assert emitted.agg(F.max("gen")).collect()[0][0] >= 2
    got = sorted(tuple(r) for r in finalize_gap_histogram(emitted).collect())
    want = sorted(
        tuple(r)
        for r in spark_queries()["ts10_gap_histogram"](spark, sf).collect()
    )
    assert got == want and len(got) > 3


def test_st32_multibatch_k_anonymity_equals_batch_dq11(spark, tmp_path):
    # group sizes that accumulate ACROSS micro-batches must fold into
    # the carried state, not restart: customers arrive as 3 id-split
    # files (maxFilesPerTrigger=1) and the finalized summary must
    # equal batch dq11 over the union cell-for-cell. Also pins the
    # alert semantics: a group's final emission carries under_k
    # consistent with its CUMULATIVE size (a group that crossed the
    # bar mid-stream stops alerting).
    import os

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        finalize_k_anonymity,
        run_available_now,
        stream_group_sizes,
    )

    sf = "/root/testdata/sf0.001"
    cust = load_table(spark, sf, "customer")
    n = cust.count()
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    parts = [
        cust.filter(F.col("c_custkey") % 3 == i) for i in range(3)
    ]
    for i, p in enumerate(parts):
        d = os.path.join(src, f"b{i}.parquet")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        t = 1_000_000_000 + i
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(d, (t, t))
    schema = spark.read.parquet(src + "/b0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    emitted = run_available_now(
        stream_group_sizes(stream, k=5),
        "st32_multibatch_test",
        "update",
        state_partitions=4,
    )
    # >=2 generations proves multi-batch state merging actually ran
    assert emitted.agg(F.max("gen")).collect()[0][0] >= 2
    got = [tuple(r) for r in finalize_k_anonymity(emitted, k=5).collect()]
    want = [
        tuple(r)
        for r in spark_queries()["dq11_k_anonymity"](spark, sf).collect()
    ]
    assert got == want

    # alert consistency on the FINAL generation per group: under_k
    # reflects the cumulative size, and at least one group crossed
    # the k=5 bar only after its first batch (flip observed)
    # (collect once; the memory-sink table cannot self-join without
    # re-aliasing, and plain python over ≤|groups|×3 rows is clearer)
    rows = emitted.collect()
    last = {}
    for r in rows:
        key = (r["c_nationkey"], r["c_mktsegment"])
        if key not in last or r["gen"] > last[key]["gen"]:
            last[key] = r
    for r in last.values():
        assert r["under_k"] == (1 if r["sz"] < 5 else 0)
    alerted = {
        (r["c_nationkey"], r["c_mktsegment"])
        for r in rows
        if r["under_k"] == 1
    }
    flipped = [
        k for k, r in last.items() if r["under_k"] == 0 and k in alerted
    ]
    assert len(flipped) >= 1


def test_st33_multibatch_order_audit_equals_batch_dq12(spark, tmp_path):
    # lateness that spans micro-batch boundaries must fold against
    # the carried running max, not restart — and the fixture INJECTS
    # disorder (the shipped feed is fully ordered, so without it this
    # would pin only zeros): user 1's event 7 (arriving in file 2) is
    # 130 s behind the running max set by event 5 (file 1). Streamed
    # as 3 id-ordered files (maxFilesPerTrigger=1), the finalized
    # summary must equal batch dq12 over the union cell-for-cell.
    import datetime
    import os

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.streaming import (
        finalize_order_audit,
        run_available_now,
        stream_order_counters,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # (event_id, user_id, ts_offset_s)
        (1, 1, 0),
        (2, 1, 200),   # running max for user 1
        (3, 2, 0),
        (4, 2, 10),
        (5, 1, 210),
        (6, 2, 20),
        (7, 1, 80),    # LATE: 130 s behind event 5's 210
        (8, 1, 300),
        (9, 2, 30),
    ]
    ev = spark.createDataFrame(
        [(e, u, ts(s)) for e, u, s in rows],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    d = str(tmp_path / "fixture")
    os.makedirs(d)
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    for i, (lo, hi) in enumerate([(1, 3), (4, 6), (7, 9)]):
        part = ev.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
        )
        pdir = os.path.join(src, f"b{i}.parquet")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        t = 1_000_000_000 + i
        for root, _, files in os.walk(pdir):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(pdir, (t, t))
    schema = spark.read.parquet(src + "/b0.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    emitted = run_available_now(
        stream_order_counters(stream),
        "st33_multibatch_test",
        "update",
        state_partitions=4,
    )
    assert emitted.agg(F.max("gen")).collect()[0][0] >= 2
    got = [tuple(r) for r in finalize_order_audit(emitted).collect()]
    want = [
        tuple(r)
        for r in spark_queries()["dq12_event_order_audit"](spark, d).collect()
    ]
    assert got == want
    # and the injected disorder is actually visible (not the all-zero
    # degenerate case): 9 events, 1 late, 130 s worst, 1 user
    assert got == [(9, 1, 1111, 130, 1)]


def test_state_partitions_env_default(monkeypatch):
    """r11 (verdict item 6): the bounded-run state partitioning is one
    env-resolved deployment default, not a literal at every registry
    call site — SPARK_GRAFT_STATE_PARTITIONS drives it, 4 is the
    measured bench-SF optimum fallback."""
    from enriched_crime_incident_data_pipeline_spark.streaming.windows import (
        default_state_partitions,
    )

    monkeypatch.delenv("SPARK_GRAFT_STATE_PARTITIONS", raising=False)
    assert default_state_partitions() == 4
    monkeypatch.setenv("SPARK_GRAFT_STATE_PARTITIONS", "16")
    assert default_state_partitions() == 16


def test_run_available_now_auto_resolves_env(spark, monkeypatch, tmp_path):
    """The "auto" default must apply the env-resolved partition count
    to the bounded run (observable via the state-store shuffle) and
    restore the session conf afterwards."""
    import pyspark.sql.functions as F

    from enriched_crime_incident_data_pipeline_spark.streaming.windows import (
        run_available_now,
    )

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, k string"
    ).write.parquet(src)
    monkeypatch.setenv("SPARK_GRAFT_STATE_PARTITIONS", "2")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    stream = spark.readStream.schema("id long, k string").parquet(src)
    out = run_available_now(
        stream.groupBy("k").agg(F.count(F.lit(1)).alias("n")),
        "t_auto_state_parts",
        "complete",
    )
    assert sorted(tuple(r) for r in out.collect()) == [("a", 1), ("b", 1)]
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
