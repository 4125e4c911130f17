#!/usr/bin/env python
"""Derive an sf1 dataset from the driver's sf0.1 parquet, for the
SCALING.md data-dominated measurement point (6 M lineitem / 50 k
documents). Deterministic — no RNG: every replica is a pure function
of the source rows and its replica index.

Why derived, not driver-generated: the driver materializes
sf{0.001,0.01,0.1} only. The sweep needs one point where data cost
dominates fixed overhead; replication with key remapping preserves
every distribution the timed queries touch (join fan-in per key,
group cardinalities, text/token-length profiles) while growing row
counts 10x.

Shapes:
- lineitem/orders: 10 replicas, orderkeys offset by k*10^7 so
  replicas never collide and orders<->lineitem joins stay 1:N with
  the original fan-out. part/supplier/customer/nation/region dims are
  copied as-is (dimension reuse means 10x fan-out per dim key — the
  realistic direction for a growing fact table).
- events: 10 replicas, event_id offset k*10^6; user_id kept (10x
  events per user).
- documents: 10 replicas, doc_id offset k*10^4; every TOKEN of
  replica k>0 gets an `rk` suffix, so replicas share zero shingles
  with each other and with the original — the near-dup structure
  WITHIN each replica is preserved, and the corpus does not become a
  10x pile of exact duplicates (which would quadratically explode
  every pair generator and measure a different workload).
- embeddings: 10 replicas, vec_id offset k*10^4; replica k>0 vectors
  are cyclically rotated by k dims — same norms, same intra-replica
  geometry, no cross-replica exact dups.

Usage: python tools/make_sf1.py [outdir] [replicas]
       (defaults: /tmp/spark_graft_sf1, 10)

Round 4: ``replicas`` is a parameter so the same derivation yields
sf3 (30) / sf10 (100) — the genuinely data-dominated points for the
heaviest document-family operators (dd5/dd13/tfidf/tp1), where sf1
was still partly overhead-dominated. Key offsets are replica-safe up
to 100 replicas (orderkey stride 10^7 -> max 10^9, doc stride 10^4).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    assert replicas <= 100, "key strides are replica-safe up to 100"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        path = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation", "customer", "supplier", "part"):
        write(t, f"SELECT * FROM {src(t)}")

    write(
        "orders",
        " UNION ALL ".join(
            f"SELECT * REPLACE (o_orderkey + {k * 10**7} AS o_orderkey) "
            f"FROM {src('orders')}"
            for k in range(replicas)
        ),
    )
    write(
        "lineitem",
        " UNION ALL ".join(
            f"SELECT * REPLACE (l_orderkey + {k * 10**7} AS l_orderkey) "
            f"FROM {src('lineitem')}"
            for k in range(replicas)
        ),
    )
    write(
        "events",
        " UNION ALL ".join(
            f"SELECT * REPLACE (event_id + {k * 10**6} AS event_id) "
            f"FROM {src('events')}"
            for k in range(replicas)
        ),
    )
    write(
        "documents",
        f"SELECT * FROM {src('documents')} UNION ALL "
        + " UNION ALL ".join(
            f"SELECT doc_id + {k * 10**4} AS doc_id, "
            "array_to_string(list_transform(string_split(text, ' '), "
            f"t -> t || 'r{k}'), ' ') AS text, "
            f"lang, source, n_chars FROM {src('documents')}"
            for k in range(1, replicas)
        ),
    )
    write(
        "embeddings",
        f"SELECT * FROM {src('embeddings')} UNION ALL "
        + " UNION ALL ".join(
            f"SELECT vec_id + {k * 10**4} AS vec_id, "
            f"list_slice(embedding, {k + 1}, len(embedding)) || "
            f"list_slice(embedding, 1, {k}) AS embedding, "
            f"label FROM {src('embeddings')}"
            for k in range(1, replicas)
        ),
    )


if __name__ == "__main__":
    main()
