"""RANK tie semantics (reference src/db/incidents.py:69-70) and
EMSSTAT propagation fixpoint (src/db/incidents.py:48-55)."""

from __future__ import annotations

from datetime import datetime

from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
    propagate_emsstat,
    propagate_emsstat_selfjoin,
)
from enriched_crime_incident_data_pipeline_spark.operators.ranks import (
    frequency_rank_table,
    with_frequency_rank,
)


def test_rank_ties_share_and_gap(spark):
    # freq: A×3, B×2, C×2, D×1 → ranks 1, 2, 2, 4 (RANK, not dense)
    rows = [("A",)] * 3 + [("B",)] * 2 + [("C",)] * 2 + [("D",)]
    df = spark.createDataFrame(rows, "location string")
    ranks = {
        r["location"]: r["location_rank"]
        for r in frequency_rank_table(df, "location", "location_rank").collect()
    }
    assert ranks == {"A": 1, "B": 2, "C": 2, "D": 4}


def test_rank_join_back_attaches_to_every_row(spark):
    rows = [("A",)] * 2 + [("B",)]
    df = spark.createDataFrame(rows, "location string")
    out = with_frequency_rank(df, "location", "location_rank").collect()
    assert len(out) == 3
    by_loc = {r["location"]: r["location_rank"] for r in out}
    assert by_loc == {"A": 1, "B": 2}


EMS_ROWS = [
    # (key, ts, location, emsstat)
    ("a", datetime(2026, 1, 2, 5, 30), "123 MAIN ST", 1),
    ("b", datetime(2026, 1, 2, 5, 30), "123 MAIN ST", 0),  # → 1 (peer)
    ("c", datetime(2026, 1, 2, 5, 30), "OTHER ST", 0),      # stays 0
    ("d", datetime(2026, 1, 2, 6, 0), "123 MAIN ST", 0),    # other ts → 0
    ("e", datetime(2026, 1, 2, 7, 0), "X", 0),
]
SCHEMA = "incident_num string, incident_ts timestamp, location string, emsstat int"
EXPECTED = {"a": 1, "b": 1, "c": 0, "d": 0, "e": 0}


def test_emsstat_window_max(spark):
    df = spark.createDataFrame(EMS_ROWS, SCHEMA)
    out = {r["incident_num"]: r["emsstat"] for r in propagate_emsstat(df).collect()}
    assert out == EXPECTED


def test_emsstat_selfjoin_witness_matches_window(spark):
    # the literal self-join port and the window-max formulation agree
    df = spark.createDataFrame(EMS_ROWS, SCHEMA)
    out = {
        r["incident_num"]: r["emsstat"]
        for r in propagate_emsstat_selfjoin(df).collect()
    }
    assert out == EXPECTED


def test_dedup_and_propagate_equals_two_stage(spark):
    import datetime as dt

    from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
        dedup_by_key,
    )
    from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
        dedup_and_propagate,
        propagate_emsstat,
    )

    t1 = dt.datetime(2026, 1, 2, 0, 3)
    t2 = dt.datetime(2026, 1, 2, 9, 0)
    rows = [
        # duplicate key (re-ingestion, identical row) + EMSSTAT pair
        ("A1", t1, "MAIN ST", 1),
        ("A1", t1, "MAIN ST", 1),
        ("A2", t1, "MAIN ST", 0),   # same (ts,loc) → propagates to 1
        ("A3", t2, "MAIN ST", 0),   # different ts → stays 0
        ("A4", t1, "VINE ST", 0),   # different loc → stays 0
    ]
    df = spark.createDataFrame(
        rows, "incident_num string, incident_ts timestamp, location string, emsstat int"
    )
    fused = sorted(map(tuple, dedup_and_propagate(df).collect()))
    two_stage = sorted(
        map(tuple, propagate_emsstat(dedup_by_key(df, "incident_num")).collect())
    )
    assert fused == two_stage
    # A1 flagged, A2 propagated via shared (ts,loc); A3 (other ts)
    # and A4 (other loc) untouched
    assert [r[3] for r in fused] == [1, 1, 0, 0]
