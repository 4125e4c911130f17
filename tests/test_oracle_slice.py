"""Rotating oracle-verification slice (round-3 verdict item 7: the
judge's spot-check loop, promoted to CI).

Each round, 25 registry queries — chosen deterministically by
rotating the sorted query list by 25 × round-index (round-index =
number of ``BENCH_r*.json`` files at the repo root, which grows by
one per driver round) — are run on Spark AND their DuckDB oracle at
sf0.001, compared with the same canonicalization the driver uses
(``selfcheck.frame_rows`` / ``values_match``). Every registry query
therefore gets locally oracle-verified every ceil(N/25) ≈ 8 rounds
without a full-registry run per push.

Run just this gate with ``pytest -m oracle_slice``; slice selection
is reproducible (pure function of the checked-in file set).
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import selfcheck  # noqa: E402  (repo-root module)
import __spark_entry__ as entry_mod  # noqa: E402

SLICE = 25
SF_DIR = "/root/testdata/sf0.001"


def _round_index() -> int:
    return len(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))


def _slice_names() -> list[str]:
    names = sorted(entry_mod.queries())
    k = (_round_index() * SLICE) % len(names)
    rotated = names[k:] + names[:k]
    return rotated[:SLICE]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _check_one(spark, con, name: str, sf_dir: str) -> None:
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    scols, srows = selfcheck.frame_rows(
        sdf.columns, [tuple(r) for r in sdf.collect()]
    )
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops, like the driver
        assert srows is not None
        return
    cur = con.execute(oracles[name])
    ocols, orows = selfcheck.frame_rows(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert scols == ocols, f"{name}: columns {scols} vs {ocols}"
    ok, note = selfcheck.values_match(srows, orows)
    assert ok, f"{name}: {note}"


@pytest.mark.oracle_slice
@pytest.mark.parametrize("name", _slice_names())
def test_oracle_slice(spark, duck, name):
    _check_one(spark, duck, name, SF_DIR)


# ---- sf0.1 heavy-query slice (round-5 verdict item 8) ----
# Scale-dependent divergence (integer overflow, float accumulation
# drift, skew-path differences) only shows where data is biggest, so
# a rotating 10-query slice of the HEAVY (bench longtail) queries
# also runs against the sf0.1 oracle each round.

SLICE_SF01 = 10
SF01_DIR = "/root/testdata/sf0.1"


def _heavy_slice_names() -> list[str]:
    import bench  # repo-root module; LONGTAIL = the measured heavy set

    names = sorted(n for n in bench.LONGTAIL if n in entry_mod.queries())
    k = (_round_index() * SLICE_SF01) % len(names)
    rotated = names[k:] + names[:k]
    return rotated[:SLICE_SF01]


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.oracle_slice
@pytest.mark.parametrize("name", _heavy_slice_names())
def test_oracle_slice_sf01(spark, duck_sf01, name):
    _check_one(spark, duck_sf01, name, SF01_DIR)
