"""Parity suite for the PDF text-block parse rules.

``_reference_extract`` is a faithful in-test replica of the
reference's extraction algorithm
(/root/reference/src/pdf/parse_incidents.py:40-56): page-0
header/trailer drops, last-page trailer drop, newline split with one
``list.remove('')``, <5-field padding and >5-field location merge.
The engine's column-expression operator must reproduce it row for row
— and the extraction *counts* mirror the reference's own test
strategy (tests/test_main.py: extract from a fixed report, assert the
incident rows come out)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
    parse_report_blocks,
    synthetic_report_blocks,
)


def _reference_extract(pages: list[list[str]]) -> list[list[str]]:
    """The reference algorithm, verbatim semantics (5-field rows)."""
    out = []
    for page_number, blocks in enumerate(pages):
        text = list(blocks)
        if page_number == 0:
            text.pop(0)
            text.pop()
            text.pop()
        elif page_number == len(pages) - 1:
            text.pop()
        for t in text:
            temp = t.split("\n")
            if "" in temp:
                temp.remove("")
            if len(temp) < 5:
                temp.insert(2, " ")
                temp.insert(3, " ")
            elif len(temp) > 5:
                temp[2] = temp[2] + temp[3]
                temp.pop(3)
            out.append(temp[:5])
    return out


def _to_blocks_df(spark, pages: list[list[str]], path="r.pdf"):
    rows = [
        (path, p, i, text)
        for p, blocks in enumerate(pages)
        for i, text in enumerate(blocks)
    ]
    return spark.createDataFrame(
        rows, "path string, page_number long, block_idx long, block_text string"
    )


HEADER = "NORMAN POLICE DEPARTMENT\nDaily Incident Summary\n"
TRAILER = "Report Generated\n"


def _block(*lines: str) -> str:
    return "\n".join(lines) + "\n"


@pytest.fixture()
def two_page_report():
    page0 = [
        HEADER,
        _block("1/2/2024 3:45", "2024-00001", "BLK 100 MAIN ST", "THEFT", "OK01"),
        _block("1/2/2024 4:00", "2024-00002", "EMS"),  # 3 lines → pad
        _block(
            "1/2/2024 4:15", "2024-00003", "BLK 200 ELM ST",
            " APT 4", "FRAUD", "OK01",
        ),  # 6 lines → merge
        TRAILER,
        "Page 1\n",
    ]
    page1 = [
        _block("1/3/2024 9:30", "2024-00004", "BLK 300 OAK AVE", "PATROL", "OK02"),
        _block("1/3/2024 9:45", "2024-00005", "BLK 400 OAK AVE", "ERROR", "OK02"),
        "End of Report\n",
    ]
    return [page0, page1]


def test_parse_matches_reference_algorithm(spark, two_page_report):
    expected = _reference_extract(two_page_report)
    got = (
        parse_report_blocks(_to_blocks_df(spark, two_page_report))
        .orderBy("page_number", "block_idx")
        .select(
            "datetime_str", "incident_num", "location", "nature", "incident_ori"
        )
        .collect()
    )
    assert [list(r) for r in got] == expected
    # reference-style count check: every data block becomes one row
    assert len(got) == 5
    # pad: blank location/nature became single spaces, ori preserved
    assert list(got[1]) == ["1/2/2024 4:00", "2024-00002", " ", " ", "EMS"]
    # merge: multi-line location concatenated with NO separator
    assert got[2]["location"] == "BLK 200 ELM ST APT 4"
    assert got[2]["nature"] == "FRAUD"


def test_single_page_takes_only_page0_branch(spark):
    """Reference if/elif: a 1-page doc drops header + two trailers but
    NOT an additional last-page block."""
    pages = [
        [
            HEADER,
            _block("2/2/2024 1:00", "2024-10001", "BLK 1 A ST", "THEFT", "OK"),
            _block("2/2/2024 1:30", "2024-10002", "BLK 2 A ST", "FRAUD", "OK"),
            TRAILER,
            "Page 1\n",
        ]
    ]
    expected = _reference_extract(pages)
    got = (
        parse_report_blocks(_to_blocks_df(spark, pages))
        .orderBy("block_idx")
        .select(
            "datetime_str", "incident_num", "location", "nature", "incident_ori"
        )
        .collect()
    )
    assert [list(r) for r in got] == expected
    assert len(got) == 2


def test_remove_first_empty_only(spark):
    """``list.remove('')`` drops the FIRST empty line only — an
    embedded blank line plus the trailing one leaves a trailing ''
    in the fields, exactly as the reference would."""
    pages = [
        [
            HEADER,
            _block("3/3/2024 2:00", "2024-20001", "", "BLK 9 B ST", "EMS"),
            TRAILER,
            "Page 1\n",
        ]
    ]
    expected = _reference_extract(pages)
    got = (
        parse_report_blocks(_to_blocks_df(spark, pages))
        .select(
            "datetime_str", "incident_num", "location", "nature", "incident_ori"
        )
        .collect()
    )
    assert [list(r) for r in got] == expected
    # first '' (the blank 3rd line) was removed; trailing '' remains
    # and the 6-line block merged lines 2+3
    assert len(got) == 1


def test_synthetic_fixture_round_trips_all_docs(spark):
    """The oracle-twinned fixture: every doc becomes exactly one
    parsed incident row; pad/merge variants land in the right shape."""
    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    parsed = parse_report_blocks(synthetic_report_blocks(docs))
    rows = parsed.collect()
    assert len(rows) == 40
    by_idx = {
        (r["page_number"], r["block_idx"]): r for r in rows
    }
    # doc 3 (3 % 7 == 3): padded — blank location and nature
    r3 = by_idx[(0, 4)]  # page 0 data blocks shift +1 for the header
    assert (r3["location"], r3["nature"]) == (" ", " ")
    # doc 5 (5 % 7 == 5): merged multi-line location
    r5 = by_idx[(0, 6)]
    assert r5["location"].endswith(" APT 5")
    # no row kept any header/trailer text
    assert all("NORMAN" not in (r["datetime_str"] or "") for r in rows)


def test_parse_plan_never_shuffles_block_relation(spark):
    """Scale invariant: the parse is map-side over the block relation —
    the only exchanges feed the tiny per-page/per-file broadcast
    aggregates, and the block table joins them via BroadcastHashJoin."""
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    parsed = parse_report_blocks(synthetic_report_blocks(docs))
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
