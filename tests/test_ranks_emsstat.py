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
