#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables, compare row count + coarse schema +
order-insensitive values.

Usage:  python selfcheck.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize one cell for order-insensitive compare."""
    import datetime as dt
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float):
        return v
    return v


def coarse_type(x) -> str:
    if x is None:
        return "null"
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, int):
        return "int"
    if isinstance(x, float):
        return "float"
    if isinstance(x, tuple):
        return "list"
    return "str"


def frame_rows(cols_in, raw_rows):
    """cols + native-python rows → (sorted cols, canonicalized rows)."""
    order = sorted(range(len(cols_in)), key=lambda i: cols_in[i])
    cols = [cols_in[i] for i in order]
    rows = [tuple(canon(row[i]) for i in order) for row in raw_rows]
    return cols, rows


def values_match(a, b) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"

    def key(row):
        return tuple("\0" if v is None else str(v) for v in row)

    sa, sb = sorted(a, key=key), sorted(b, key=key)
    max_float_diff = 0.0
    for i, (ra, rb) in enumerate(zip(sa, sb)):
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb:
                    d = abs(va - vb)
                    max_float_diff = max(max_float_diff, d)
                    if d > 1e-9 * max(1.0, abs(va), abs(vb)):
                        return False, f"float mismatch row {i}: {ra} vs {rb}"
                continue
            if va != vb:
                return False, f"value mismatch row {i}: {ra!r} vs {rb!r}"
    note = f"max_float_diff={max_float_diff:.2e}" if max_float_diff else "exact"
    return True, note


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from enriched_crime_incident_data_pipeline_spark import get_spark

    spark = get_spark(app_name="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols_in = sdf.columns
            sraw = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sraw)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols_in = [d[0] for d in cur.description]
            oraw = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: DUCKDB ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        scols, srows = frame_rows(scols_in, sraw)
        ocols, orows = frame_rows(ocols_in, oraw)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        stypes = [
            next((coarse_type(r[i]) for r in srows if r[i] is not None), "null")
            for i in range(len(scols))
        ]
        otypes = [
            next((coarse_type(r[i]) for r in orows if r[i] is not None), "null")
            for i in range(len(ocols))
        ]
        if stypes != otypes:
            print(f"FAIL  {name}: types {list(zip(scols, stypes))} vs {otypes}")
            n_fail += 1
            continue
        ok, note = values_match(srows, orows)
        status = "ok" if ok else "FAIL"
        print(f"{status:5} {name}: rows={len(srows)} {note} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
