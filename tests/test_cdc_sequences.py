"""Semantic pins for the changelog/sequence operator family:
latest-wins CDC fold, interval coalescing, cumulative distinct,
hyperplane-LSH signatures, and the constraint audit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
    _rademacher_plane,
    hyperplane_signatures,
)
from enriched_crime_incident_data_pipeline_spark.operators.cdc import latest_state
from enriched_crime_incident_data_pipeline_spark.operators.timeseries import (
    coalesce_intervals,
    cumulative_distinct_daily,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_latest_state_latest_wins_and_tombstones(spark):
    rows = [
        # key 1: upsert then delete → dropped entirely
        (1, _ts(0), 0, "upsert", 1.0),
        (1, _ts(1), 1, "delete", 0.0),
        # key 2: delete then upsert → survives with last payload
        (2, _ts(0), 2, "delete", 0.0),
        (2, _ts(5), 3, "upsert", 7.5),
        # key 3: same ts, event_id breaks the tie → id 5 wins
        (3, _ts(2), 4, "upsert", 1.0),
        (3, _ts(2), 5, "upsert", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, event_id int, op string, v double"
    )
    out = {
        r["k"]: (r["op"], r["v"], r["n_changes"])
        for r in latest_state(
            df,
            key_cols=["k"],
            version_cols=["ts", "event_id"],
            payload_cols=["op", "v"],
            is_delete=F.col("op") == "delete",
        ).collect()
    }
    assert 1 not in out  # tombstone wins
    assert out[2] == ("upsert", 7.5, 2)  # resurrection after delete
    assert out[3] == ("upsert", 2.0, 2)  # event_id tiebreak


def test_coalesce_intervals_islands_and_span(spark):
    # key 1: [0,10) [5,15) overlap → one island [0,15); [20,30) apart
    # key 2: [0,10) [10,20) touch at the boundary (10 > 10 false) →
    # merged: containment [0,100) ∪ [1,2) → one island of 100
    rows = [
        (1, 0, 10),
        (1, 5, 15),
        (1, 20, 30),
        (2, 0, 10),
        (2, 10, 20),
        (3, 0, 100),
        (3, 1, 2),
    ]
    df = spark.createDataFrame(rows, "k int, s long, e long")
    out = {
        r["k"]: (r["n_islands"], r["covered_us"])
        for r in coalesce_intervals(df, ["k"], "s", "e").collect()
    }
    assert out[1] == (2, 25)  # 15 + 10
    assert out[2] == (1, 20)  # touching intervals merge
    assert out[3] == (1, 100)  # contained interval adds nothing


def test_cumulative_distinct_counts_first_seen_only(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 9)),
        (1, dt.datetime(2024, 1, 2, 9)),  # repeat user: not new on d2
        (2, dt.datetime(2024, 1, 2, 9)),
        (3, dt.datetime(2024, 1, 2, 10)),
        (3, dt.datetime(2024, 1, 4, 10)),
    ]
    df = spark.createDataFrame(rows, "uid int, ts timestamp")
    out = {
        str(r["day"]): (r["new_entities"], r["cumulative_entities"])
        for r in cumulative_distinct_daily(df, "uid", "ts").collect()
    }
    assert out["2024-01-01"] == (1, 1)
    assert out["2024-01-02"] == (2, 3)
    assert "2024-01-04" not in out  # user 3 already counted


def test_hyperplane_signature_matches_python_reference(spark):
    # pin the full signature computation against a pure-Python fold
    vecs = [(0, [0.5, -1.25, 3.0, 0.0]), (1, [-0.1, 0.2, -0.3, 0.4])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["sig"]
        for r in hyperplane_signatures(df, n_planes=4, dim=4).collect()
    }
    import math

    for vid, v in vecs:
        q = [math.floor(float(x) * 1e6) for x in v]
        sig = 0
        for j in range(4):
            c = _rademacher_plane(j, 4)
            if sum(a * b for a, b in zip(q, c)) >= 0:
                sig |= 1 << j
        assert out[vid] == sig, f"vec {vid}"


def test_hyperplane_identical_vectors_share_bucket(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0]), (2, [-1.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = hyperplane_signatures(df, n_planes=8, dim=2).collect()
    sig = {r["vec_id"]: r["sig"] for r in rows}
    size = {r["vec_id"]: r["bucket_size"] for r in rows}
    assert sig[0] == sig[1] and size[0] == 2
    # antipodal vector flips every projection with a nonzero sum
    assert sig[2] != sig[0]


def test_banded_pairs_catch_hamming_one_pigeonhole(spark):
    # identical vectors → Hamming 0; a vector scaled by a positive
    # constant keeps every projection sign → still Hamming 0 and the
    # pair MUST be found (2 bands guarantee recall at Hamming ≤ 1);
    # the antipodal vector flips all bits → no shared band, excluded
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        hyperplane_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, -3.0, 0.5]),
            (1, [2.0, 4.0, -6.0, 1.0]),  # same direction
            (2, [-1.0, -2.0, 3.0, -0.5]),  # antipodal
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hyperplane_near_dup_pairs(
            df, n_planes=16, dim=4, band_bits=8, max_hamming=4
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winsorize_clamps_only_tails(spark, tmp_path):
    # 1..20 with p05/p95 interpolated bounds: the mean of clamped
    # values moves toward the center, extremes count as clamped
    rows = [("A", float(i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/lineitem.parquet")
    from enriched_crime_incident_data_pipeline_spark.registry import (
        q_stat5_winsorize,
    )

    out = q_stat5_winsorize(spark, sf).collect()[0]
    import pytest as _pt

    # linear interpolation at fractional positions 0.95 / 18.05
    # (cross-engine bit-equality is the selfcheck's job; here pin value)
    assert out["p05"] == _pt.approx(1.95, abs=1e-9)
    assert out["p95"] == _pt.approx(19.05, abs=1e-9)
    assert out["n_low"] == 1 and out["n_high"] == 1
    # sum = 1.95 + sum(2..19) + 19.05 = 210.0 - 1 - 20 + 1.95 + 19.05
    assert out["winsorized_mean"] == 210.0 / 20


def test_constraint_audit_counts_injected_violations(spark, tmp_path):
    # build a tiny lake with one violation of each class
    orders = spark.createDataFrame(
        [
            (1, 10, dt.datetime(2024, 1, 5)),
            (1, 11, dt.datetime(2024, 1, 5)),  # duplicate PK
            (2, None, dt.datetime(2024, 1, 6)),  # NULL FK
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, 5.0, 0.05, dt.datetime(2024, 1, 7)),
            (1, 99.0, 0.05, dt.datetime(2024, 1, 7)),  # qty out of range
            (1, 5.0, 1.5, dt.datetime(2024, 1, 7)),  # discount out of range
            (7, 5.0, 0.05, dt.datetime(2024, 1, 7)),  # orphan order key
            (2, 5.0, 0.05, dt.datetime(2024, 1, 1)),  # shipped before order
        ],
        "l_orderkey long, l_quantity double, l_discount double,"
        " l_shipdate timestamp",
    )
    sf = str(tmp_path)
    orders.write.parquet(f"{sf}/orders.parquet")
    li.write.parquet(f"{sf}/lineitem.parquet")
    from enriched_crime_incident_data_pipeline_spark.registry import (
        q_dq1_constraint_audit,
    )

    out = {
        r["check_name"]: r["violations"]
        for r in q_dq1_constraint_audit(spark, sf).collect()
    }
    assert out == {
        "orders_pk_dup": 1,
        "orders_null_cust": 1,
        "li_qty_range": 1,
        "li_discount_range": 1,
        "li_orphan": 1,
        "li_ship_before_order": 1,
    }


def test_last_touch_attribution_strictly_preceding(spark, tmp_path):
    ns = 1_000_000_000
    rows = [
        # user 1: click@10s, view@20s, purchase@30s → credits click 100
        (1, 100, "click", 10 * ns),
        (1, 101, "view", 20 * ns),
        (1, 102, "purchase", 30 * ns),
        # purchase@40s still credits click 100 (no newer click)
        (1, 103, "purchase", 40 * ns),
        # user 2: purchase BEFORE any click → NULL attribution
        (2, 200, "purchase", 10 * ns),
        (2, 201, "click", 20 * ns),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts long"
    )
    sf = str(tmp_path)
    df.write.parquet(f"{sf}/events.parquet")
    from enriched_crime_incident_data_pipeline_spark.registry import (
        q_attr1_last_touch,
    )

    out = {
        r["purchase_id"]: (r["click_id"], r["latency_us"])
        for r in q_attr1_last_touch(spark, sf).collect()
    }
    assert out[102] == (100, 20_000_000)
    assert out[103] == (100, 30_000_000)
    assert out[200] == (None, None)


def test_profile_counts_nulls_and_distincts(spark, tmp_path):
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, None, "O", 5.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (3, 11, "F", None, dt.datetime(2024, 1, 2), "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = str(tmp_path)
    orders.write.parquet(f"{sf}/orders.parquet")
    from enriched_crime_incident_data_pipeline_spark.registry import (
        q_dq2_profile,
    )

    out = {
        r["column_name"]: (r["n_nulls"], r["n_distinct"])
        for r in q_dq2_profile(spark, sf).collect()
    }
    assert out["o_orderkey"] == (0, 3)
    assert out["o_custkey"] == (1, 2)
    assert out["o_totalprice"] == (1, 1)
    assert out["o_orderpriority"] == (0, 2)


def test_equidepth_histogram_uniform_buckets(spark, tmp_path):
    li = spark.createDataFrame(
        [(float(i),) for i in range(1, 101)], "l_extendedprice double"
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    from enriched_crime_incident_data_pipeline_spark.registry import (
        q_hist2_equidepth,
    )

    rows = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in q_hist2_equidepth(spark, sf).collect()
    }
    assert len(rows) == 10
    assert all(n == 10 for n, _, _ in rows.values())
    assert rows[0] == (10, 1.0, 10.0)
    assert rows[9] == (10, 91.0, 100.0)


def test_cdc2_snapshot_diff_all_three_statuses(spark):
    """Fixture exercising every diff class: a user whose first event
    lands inside the window (added), one whose state flips inside
    it (changed), one untouched (unchanged), and one whose newest
    event inside the window REAFFIRMS the same state (unchanged —
    the diff compares state, not activity)."""
    import datetime as dt
    import os
    import tempfile

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t_end = dt.datetime(2026, 1, 2, 12, 0, 0)
    old = t_end - dt.timedelta(hours=5)
    recent = t_end - dt.timedelta(minutes=10)
    rows = [
        # user 1: added (first event in the last hour)
        (1, recent, 1, "view", 1.0),
        # user 2: changed (value flips in the window)
        (2, old, 2, "view", 1.0),
        (3, recent, 2, "view", 2.0),
        # user 3: unchanged (no events in the window)
        (4, old, 3, "click", 5.0),
        # user 4: unchanged (recent event reaffirms the same state)
        (5, old, 4, "view", 7.0),
        (6, recent, 4, "view", 7.0),
        # anchor row pinning max(ts) = t_end for user 2
        (7, t_end, 2, "view", 2.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    ).withColumn("props", F.lit("{}"))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["status"]: r["n_users"]
        for r in spark_queries()["cdc2_snapshot_diff"](spark, d).collect()
    }
    # user 2's anchor row keeps its state = 2.0 (changed vs 1.0)
    assert got == {"added": 1, "changed": 1, "unchanged": 2}


def test_seq3_collocations_lift_hand_computed(spark):
    """Lift arithmetic pinned on a constructed corpus: a bigram
    always appearing together scores lift = N/(c_a·c_b)·c_ab in bp
    exactly; a bigram of two frequent-but-independent tokens scores
    near 10000·N/(c_a·c_b)·c_ab; min-support 5 drops rare pairs."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    # "aa bb" 6 times (always adjacent); "cc" and "dd" frequent but
    # never adjacent; "ee ff" only 2 times (below support)
    texts = ["aa bb"] * 6 + ["cc xx dd"] * 6 + ["ee ff"] * 2
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string,"
        " source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["w1"], r["w2"]): (r["c_ab"], r["lift_bp"])
        for r in spark_queries()["seq3_collocations"](spark, d).collect()
    }
    n_tok = 6 * 2 + 6 * 3 + 2 * 2  # 34
    assert out[("aa", "bb")] == (6, 6 * n_tok * 10000 // (6 * 6))
    assert ("ee", "ff") not in out
    # "cc xx" and "xx dd" both present with c_ab=6, c=6 each
    assert out[("cc", "xx")] == (6, 6 * n_tok * 10000 // (6 * 6))
