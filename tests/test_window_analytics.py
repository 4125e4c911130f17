"""Window-analytics pins: lag deltas, rolling frames, range frames,
ntile bucketing, grouping sets, unpivot."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_lag_delta_resets_per_partition(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 13.0), (2, 1, 5.0)],
        "grp int, seq int, v double",
    )
    w = Window.partitionBy("grp").orderBy("seq")
    rows = {
        (r["grp"], r["seq"]): r["d"]
        for r in df.select(
            "grp", "seq", (F.col("v") - F.lag("v").over(w)).alias("d")
        ).collect()
    }
    assert rows[(1, 2)] == 3.0
    assert rows[(1, 1)] is None and rows[(2, 1)] is None


def test_rows_frame_is_positional_not_valued(spark):
    # two rows share seq=2: a ROWS frame of size 2 sees exactly 2 rows
    df = spark.createDataFrame(
        [(1, 1), (2, 10), (2, 100), (3, 1000)], "seq int, v int"
    )
    w = Window.orderBy("seq", "v").rowsBetween(-1, 0)
    out = [r["s"] for r in df.select(F.sum("v").over(w).alias("s")).collect()]
    assert out == [1, 11, 110, 1100]


def test_range_frame_includes_value_peers(spark):
    # RANGE frame keyed on value: both seq=2 rows see each other
    df = spark.createDataFrame(
        [(1, 1), (2, 10), (2, 100), (4, 1000)], "seq int, v int"
    )
    w = Window.orderBy("seq").rangeBetween(-1, 0)
    out = sorted(
        r["s"] for r in df.select(F.sum("v").over(w).alias("s")).collect()
    )
    # seq=1 → 1; seq=2 rows → 1+10+100 each; seq=4 → 1000 (no seq 3)
    assert out == [1, 111, 111, 1000]


def test_ntile_splits_evenly_with_remainder_first(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    w = Window.orderBy("v")
    buckets = [
        r["q"] for r in df.select(F.ntile(4).over(w).alias("q")).collect()
    ]
    # 10 rows into 4 tiles → sizes 3,3,2,2
    assert buckets == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_grouping_sets_marker_distinguishes_subtotal_null(spark):
    df = spark.createDataFrame(
        [(None, "x", 1), ("a", "x", 2), ("a", "y", 4)],
        "k string, j string, v int",
    )
    df.createOrReplaceTempView("gs_src")
    rows = spark.sql(
        """
        SELECT k, grouping(k) AS g, sum(v) AS s
        FROM gs_src GROUP BY GROUPING SETS ((k), ())
        """
    ).collect()
    by_key = {(r["k"], r["g"]): r["s"] for r in rows}
    # data NULL (g=0) is distinct from the grand-total NULL (g=1)
    assert by_key[(None, 0)] == 1
    assert by_key[(None, 1)] == 7
    assert by_key[("a", 0)] == 6


def test_unpivot_round_trips_wide_row(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "k int, m1 double, m2 double")
    long = df.unpivot(
        ids=["k"], values=["m1", "m2"],
        variableColumnName="measure", valueColumnName="value",
    )
    assert sorted((r["measure"], r["value"]) for r in long.collect()) == [
        ("m1", 2.0),
        ("m2", 3.0),
    ]


def test_semi_join_never_duplicates_left(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, "a"), (1, "b")], "k int, x string")
    out = left.join(right, "k", "left_semi").collect()
    assert [r["k"] for r in out] == [1]


def test_trailing_90d_range_frame_on_dates(spark):
    rows = [
        (1, dt.date(2024, 1, 1), 10.0),
        (1, dt.date(2024, 3, 1), 20.0),   # 60 days later: in range
        (1, dt.date(2024, 7, 1), 40.0),   # >90 days after both
    ]
    df = spark.createDataFrame(rows, "k int, day date, v double")
    w = (
        Window.partitionBy("k")
        .orderBy(F.datediff("day", F.lit("1992-01-01")))
        .rangeBetween(-90, 0)
    )
    out = {
        r["day"]: r["s"]
        for r in df.select("day", F.sum("v").over(w).alias("s")).collect()
    }
    assert out[dt.date(2024, 1, 1)] == 10.0
    assert out[dt.date(2024, 3, 1)] == 30.0
    assert out[dt.date(2024, 7, 1)] == 40.0


def test_ts8_time_weighted_avg_hand_computed(spark):
    # irregular intervals dominate the mean by duration; ties order
    # by event_id; the last reading carries zero weight; a
    # single-event user has no span and is dropped
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 10.0 held 100s, then 20.0 held 10s, then 99.0 (tail)
        (1, t0, 1, "view", 10.0),
        (2, t0 + dt.timedelta(seconds=100), 1, "view", 20.0),
        (3, t0 + dt.timedelta(seconds=110), 1, "view", 99.0),
        # user 2: single event -> dropped
        (4, t0, 2, "view", 5.0),
        # user 3: two events at the SAME ts -> zero span -> dropped
        (5, t0, 3, "view", 1.0),
        (6, t0, 3, "view", 2.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["user_id"]: (r["total_seconds"], r["twa_milli"])
        for r in spark_queries()["ts8_time_weighted_avg"](spark, d).collect()
    }
    # user 1: num = 100*10000 + 10*20000 = 1_200_000 milli·s, den = 110
    assert out == {1: (110, 1_200_000 // 110)}


def test_ts9_max_concurrency_hand_computed(spark):
    # staircase overlap peaks at 3 when the third interval opens;
    # half-open intervals: an event exactly 1800s after another does
    # NOT overlap it; duplicate timestamps both count; a lone event
    # peaks at 1
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = dt.datetime(2026, 1, 1)

    def ev(eid, uid, secs):
        return (eid, t0 + dt.timedelta(seconds=secs), uid, "view", 1.0)

    rows = [
        # user 1: opens at 0, 600, 1200 -> all three open at t=1200;
        # the 4th at 1800 starts exactly when [0,1800) closes (no 4)
        ev(1, 1, 0), ev(2, 1, 600), ev(3, 1, 1200), ev(4, 1, 1800),
        # user 2: two events at the SAME instant -> peak 2 at t0
        ev(5, 2, 0), ev(6, 2, 0),
        # user 3: lone event -> peak 1
        ev(7, 3, 50),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    out = {
        r["user_id"]: (r["max_concurrency"], r["peak_at_us"])
        for r in spark_queries()["ts9_max_concurrency"](spark, d).collect()
    }
    assert out == {
        1: (3, us + 1_200_000_000),
        2: (2, us),
        3: (1, us + 50_000_000),
    }


def test_ts9_max_concurrency_matches_python_sweep(spark):
    # property: the relational sweep equals a brute-force per-key
    # Python sweep on adversarial random intervals (duplicate starts,
    # end==start touches, nesting)
    import random

    from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
        max_concurrency,
    )

    rng = random.Random(77)
    rows = []
    for k in range(6):
        for _ in range(rng.randint(1, 40)):
            s = rng.randrange(0, 50) * 100
            rows.append((k, s, s + rng.choice([100, 300, 700, 1800])))
    df = spark.createDataFrame(rows, "k int, s long, e long")
    got = {
        r["k"]: (r["max_concurrency"], r["peak_at"])
        for r in max_concurrency(df, ["k"], "s", "e").collect()
    }

    exp = {}
    for k in {r[0] for r in rows}:
        deltas = []
        for kk, s, e in rows:
            if kk == k:
                deltas += [(s, 1), (e, -1)]
        deltas.sort()  # (t, d): -1 before +1 at equal t
        run, best, best_t = 0, 0, None
        for t, d in deltas:
            run += d
            if run > best:
                best, best_t = run, t
        exp[k] = (best, best_t)
    assert got == exp


def test_stat6_linear_trend_hand_cases(spark):
    """Exact OLS integers: a perfect 2 units/sec line reports exactly
    2000*86400 milli/day with r2 = 10000 bp (the two-step floored
    division is exact when den divides); a constant series reports
    slope 0, r2 0; a single-instant type is degenerate (den = 0)."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # "line": value = 2*t exactly
    for sec in range(0, 50, 5):
        rows.append((eid, t0 + dt.timedelta(seconds=sec), 1, "line",
                     2.0 * sec))
        eid += 1
    # "flat": constant value over time
    for sec in range(0, 30, 3):
        rows.append((eid, t0 + dt.timedelta(seconds=sec), 1, "flat", 7.25))
        eid += 1
    # "point": two rows at one instant
    rows.append((eid, t0, 2, "point", 1.0)); eid += 1
    rows.append((eid, t0, 2, "point", 9.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_type"]: (r["n"], r["slope_milli_per_day"], r["r2_bp"])
        for r in spark_queries()["stat6_linear_trend"](spark, d).collect()
    }
    assert got == {
        "line": (10, 2000 * 86400, 10000),
        "flat": (10, 0, 0),
        "point": (2, 0, 0),
    }


def test_json2_schema_profile_mixed_types_fixture(spark):
    """The profiling machinery on a genuinely messy column (the real
    testdata's props is single-keyed): mixed int/float/bool/null/
    string values per key, keys missing from some rows, and the
    dominant-type tie rule (count desc, then name DESC — pinned to
    match array_max's struct comparison)."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    props = [
        '{"a": 1, "b": "x"}',
        '{"a": 2.5, "b": true}',
        '{"a": null, "c": "only-here"}',
        '{"a": 3}',
        '{"b": "y"}',
    ]
    rows = [
        (i, dt.datetime(2026, 1, 1), 1, "view", 1.0, p)
        for i, p in enumerate(props)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["key"]: tuple(r)[1:]
        for r in spark_queries()["json2_schema_profile"](spark, d).collect()
    }
    # (n, n_int, n_float, n_bool, n_null, n_string, dominant)
    assert got == {
        "a": (4, 2, 1, 0, 1, 0, "int"),
        "b": (3, 0, 0, 1, 0, 2, "string"),
        "c": (1, 0, 0, 0, 0, 1, "string"),
    }


def test_stat7_lorenz_curve_hand_computed(spark):
    """Lorenz polyline on a hand distribution: 3 users with 1 event,
    1 user with 7 — the bottom 75% of users hold exactly 30% of
    events; the curve is monotone, ends at (10000, 10000), and
    users-share always >= events-share (ascending-activity
    convention ⇒ the curve sits under the diagonal)."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    rows = []
    eid = 0
    for u, k in [(1, 1), (2, 1), (3, 1), (4, 7)]:
        for i in range(k):
            rows.append(
                (eid, dt.datetime(2026, 1, 1, 0, 0, i), u, "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = sorted(
        (r["n_events_level"], r["users_at_level"],
         r["cum_users_bp"], r["cum_events_bp"])
        for r in spark_queries()["stat7_lorenz_curve"](spark, d).collect()
    )
    assert out == [(1, 3, 7500, 3000), (7, 1, 10000, 10000)]
    for _, _, u_bp, e_bp in out:
        assert u_bp >= e_bp


def test_trend_from_moments_explicit_group_cols_survives_reserved_name(spark):
    """r8 advisor guard: a caller whose group column collides with a
    reserved moment name ('num' here) silently loses it under
    inference; the explicit group_cols parameter carries it through.
    Moments for y = 2x (exact integers) pin slope = 2000 milli/day
    per group and r2_bp = 10000."""
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.functions.stats import (
        trend_from_moments,
    )

    # two groups, named by the RESERVED column 'num'; x in days→secs
    xs = [0, 86400, 172800]
    rows = [(g, x, 2 * x) for g in ("a", "b") for x in xs]
    base = spark.createDataFrame(rows, "num string, x long, y long")
    dec = "decimal(38,0)"
    agg = base.groupBy("num").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
    )
    out = trend_from_moments(agg, group_cols=["num"])
    got = {
        r["num"]: (r["slope_milli_per_day"], r["r2_bp"]) for r in out.collect()
    }
    # slope: y rises 2 units per x unit → 2·86400 per day → in
    # milli-units: num·86400 DIV den with y already integer = 2000?
    # exact check: num = n·Σxy − ΣxΣy, den = n·Σx² − (Σx)²; y=2x ⇒
    # num = 2·den ⇒ slope_milli = (2·den·86400) DIV den... compute:
    import fractions

    n = 3
    sx = sum(xs); sy = sum(2 * x for x in xs)
    sxx = sum(x * x for x in xs); sxy = sum(x * 2 * x for x in xs)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    want_slope = (num * 86400) // den
    assert got == {"a": (want_slope, 10000), "b": (want_slope, 10000)}
