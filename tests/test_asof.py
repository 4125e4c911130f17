"""As-of join (operators/asof.py): exact point-in-time semantics —
at-or-before inclusion, deterministic exact-ts tiebreak, NULLs for
no-match, key isolation — pinned against a naive theta-join reference
on a hand fixture, plus partitioning invariance.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01T10:00")),   # after two views
            (2, 10, _ts("2026-01-01T09:00")),   # exact-ts tie with view 102
            (3, 10, _ts("2026-01-01T07:00")),   # before all views → NULL
            (4, 20, _ts("2026-01-01T12:00")),   # other key, isolated
            (5, 30, _ts("2026-01-01T12:00")),   # key with no views → NULL
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2026-01-01T08:00"), 1.0),
            (102, 10, _ts("2026-01-01T09:00"), 2.0),
            (103, 10, _ts("2026-01-01T09:00"), 3.0),  # same ts: larger id wins
            (104, 20, _ts("2026-01-01T11:00"), 4.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    out = asof_join(left, right, ["user_id"], "ts", "event_id")
    got = {r["event_id"]: (r["asof_event_id"], r["asof_value"]) for r in out.collect()}
    assert got == {
        1: (103, 3.0),
        2: (103, 3.0),   # <= includes the equal-ts row; id 103 beats 102
        3: (None, None),
        4: (104, 4.0),
        5: (None, None),
    }
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_matches_theta_reference_and_partitioning(spark):
    # random-ish fixture; reference = theta-join + argmax per left row
    left = spark.createDataFrame(
        [(i, i % 7, _ts("2026-01-01T00:00") + dt.timedelta(minutes=3 * i)) for i in range(60)],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1000 + j, j % 7, _ts("2026-01-01T00:00") + dt.timedelta(minutes=5 * j), float(j))
            for j in range(40)
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    theta = (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id")) & (F.col("r.ts") <= F.col("l.ts")),
            "left",
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
                    "l.event_id"
                ).orderBy(F.desc("r.ts"), F.desc("r.event_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("l.event_id").alias("event_id"),
            F.col("r.event_id").alias("asof_event_id"),
            F.col("r.value").alias("asof_value"),
        )
    )
    expected = {r["event_id"]: (r["asof_event_id"], r["asof_value"]) for r in theta.collect()}
    for nparts in (1, 8):
        out = asof_join(
            left.repartition(nparts), right.repartition(nparts), ["user_id"], "ts", "event_id"
        )
        got = {r["event_id"]: (r["asof_event_id"], r["asof_value"]) for r in out.collect()}
        assert got == expected


def test_interval_overlap_join_exact_once_and_plan(spark):
    """j11: every overlapping pair appears exactly once (start-bucket
    attribution replaces a dedup shuffle), matches brute force, and
    the plan is a hash join on the bucket."""
    from enriched_crime_incident_data_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = [(i, i * 50, i * 50 + 120) for i in range(40)]
    right = [(100 + j, j * 35, j * 35 + 80) for j in range(60)]
    l = spark.createDataFrame(left, "lid long, llo long, lhi long")
    r = spark.createDataFrame(right, "rid long, rlo long, rhi long")
    out = interval_overlap_join(
        l, r, "lid", "llo", "lhi", "rid", "rlo", "rhi", bucket_width=64
    )
    rows = [(x["lid"], x["rid"], x["overlap_len"]) for x in out.collect()]
    assert len(rows) == len(set(rows)), "pair emitted more than once"
    want = {
        (a, b, min(ahi, bhi) - max(alo, blo))
        for a, alo, ahi in left
        for b, blo, bhi in right
        if alo <= bhi and blo <= ahi
    }
    assert set(rows) == want and want

    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_asof_intervals_containment_equals_asof_join(spark):
    # the st21 building block: key+containment join over
    # asof_intervals must equal asof_join(direction='backward') —
    # including greatest-tiebreak at equal ts (rows 10/11 share a
    # ts) and the no-match-before-first-right case
    import datetime as dt

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_intervals,
        asof_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 100, ts(5)), (2, 100, ts(10)), (3, 100, ts(2)), (4, 200, ts(7))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 100, ts(10), 1.0),
            (11, 100, ts(10), 2.0),  # same ts, greater tiebreak wins
            (12, 100, ts(4), 3.0),
            (13, 300, ts(1), 4.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    want = sorted(
        tuple(r)
        for r in asof_join(left, right, ["user_id"], "ts", "event_id")
        .select("event_id", "asof_event_id", "asof_value")
        .collect()
    )
    dim = asof_intervals(right, ["user_id"], "ts", "event_id")
    got = sorted(
        tuple(r)
        for r in left.join(
            dim,
            (left["user_id"] == dim["user_id"])
            & (dim["valid_from"] <= left["ts"])
            & (dim["valid_to"].isNull() | (left["ts"] < dim["valid_to"])),
            "left",
        )
        .select("event_id", "asof_event_id", "asof_value")
        .collect()
    )
    assert got == want
    # row 2 (ts=10) must have picked tiebreak 11, not 10
    assert (2, 11, 2.0) in got


def test_asof_window_agg_matches_python_model(spark):
    """Point-in-time aggregate == a brute-force Python model on
    adversarial data: simultaneous left/right rows (strictly-before
    excludes ties at the same (ts, id)), horizon-boundary inclusion
    (exactly lookback seconds before IS in horizon), bucket-straddle
    pairs, and zero-history lefts emitting count 0."""
    import datetime as dt
    import math
    import random

    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_window_agg,
    )

    rng = random.Random(4242)
    t0 = dt.datetime(2026, 1, 1)
    lefts, rights = [], []
    eid = 0
    for _ in range(120):
        u = rng.randrange(4)
        sec = rng.randrange(0, 7200)
        if rng.random() < 0.4:
            lefts.append((eid, u, t0 + dt.timedelta(seconds=sec)))
        else:
            rights.append(
                (eid, u, t0 + dt.timedelta(seconds=sec),
                 rng.randrange(100) / 7.0)
            )
        eid += 1
    # force a tie pair and an exact-boundary pair
    lefts.append((900, 9, t0))
    rights.append((899, 9, t0, 5.0))          # same ts, smaller id: in
    rights.append((901, 9, t0, 5.0))          # same ts, larger id: out
    lefts.append((903, 8, t0 + dt.timedelta(seconds=1800)))
    rights.append((902, 8, t0, 3.0))          # exactly lookback: in

    l_df = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    r_df = spark.createDataFrame(
        rights, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["n_prev"], r["sum_prev_milli"])
        for r in asof_window_agg(
            l_df, r_df, ["user_id"], "ts", "event_id", "value", 1800
        ).collect()
    }
    exp = {}
    for le, lu, lts in lefts:
        n = s = 0
        for re_, ru, rts, rv in rights:
            if ru != lu:
                continue
            if (rts, re_) >= (lts, le):
                continue
            if rts < lts - dt.timedelta(seconds=1800):
                continue
            n += 1
            s += math.floor(rv * 1000.0)
        exp[le] = (n, s)
    assert got == exp
    assert any(v == (0, 0) for v in got.values())
