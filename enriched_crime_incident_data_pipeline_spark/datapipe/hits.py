"""HITS (Kleinberg hub/authority) scoring over a document link graph.

The second classic link-centrality signal next to PageRank
(``datapipe/pagerank.py``): crawl curation uses authority-like scores
to prioritize fetch frontiers and to weight sources in mixture
construction, and the hub/authority split distinguishes "pages that
aggregate" from "pages that are cited".

Bit-exactness design — INTEGER power iteration: the textbook HITS
normalizes (L2) every round, which drags ``sqrt`` (a transcendental
whose last ulp is libm-dependent) into the iterate and makes
cross-engine exactness unattainable. This implementation runs the
power iteration UN-normalized for a fixed round count: scores start
at 1 and every update is a sum of ``BIGINT``s, so all intermediate
values are exact integers — and integer addition is ASSOCIATIVE, so
the production aggregation shape (unordered, map-side-combinable
``sum`` — no ordered-fold contortions, no collect_list) is already
engine- and partitioning-independent, bit-for-bit. Rankings are
unaffected (normalization only rescales); a consumer that wants the
conventional unit-scale scores divides ONCE at the read boundary.

Magnitude bound (why this does not overflow): one round multiplies
the worst-case score by at most ``max_in_deg × max_out_deg``; after
``k`` rounds scores are ≤ ``n · (max_in · max_out)^k``. The near-dup
citation graphs this runs on (edges ∝ duplicates, degrees in the
tens) stay far below 2^63 at the default 4 rounds; Spark runs ANSI
sum-overflow checks and DuckDB sums into HUGEINT, so a violation is
a loud error on either engine, never silent wraparound.

Scale shape: each half-round is one |E|-row broadcast-free equi-join
(edges × current scores, partitioned on the join key) plus one
map-side-combinable ``groupBy().sum()`` — linear in edges per round,
fixed round count, no global barrier other than the rounds
themselves. The score relations mid-iteration are SPARSE (nodes with
zero in/out flow drop out and contribute nothing); the full node set
re-enters once at the output join with ``coalesce(0)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
    DRIVER_GRAPH_EDGES,
)


def _hits_local(head, iters: int, members: set) -> list:
    """Exact integer HITS over a driver-resident edge list — the same
    recurrence as the distributed path (h_0 ≡ 1 on ``nodes`` only:
    the distributed round-1 join e⋈h drops contributions from srcs
    outside the node set, so the seed here is restricted to
    ``members`` — srcs verified present in ``nodes``; integer sums
    are associative, so any summation order is THE answer). Python
    ints (arbitrary precision) mean overflow is impossible here; the
    distributed/oracle BIGINT bound still governs the contract."""
    edges = [(r[0], r[1]) for r in head]
    h = {u: 1 for u, _ in edges if u in members}
    a: dict = {}
    for _ in range(iters):
        a = {}
        for u, v in edges:
            a[v] = a.get(v, 0) + h.get(u, 0)
        h = {}
        for u, v in edges:
            h[u] = h.get(u, 0) + a.get(v, 0)
    keys = set(a) | set(h)
    return [(k, a.get(k, 0), h.get(k, 0)) for k in sorted(keys)]


def hits_scores(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    driver_graph_edges: int = DRIVER_GRAPH_EDGES,
    nodes_cover_edges: bool = False,
) -> DataFrame:
    """``(id, authority, hub)`` after ``iters`` un-normalized HITS
    rounds over directed ``edges``; every node in ``nodes`` appears
    (zero scores for nodes outside the link flow).

    Round k:  a_k(v) = Σ_{(u,v)∈E} h_{k-1}(u)   (authority ← hubs in)
              h_k(v) = Σ_{(v,u)∈E} a_k(u)       (hub ← authorities out)
    with h_0 ≡ 1. All sums are BIGINT — see module docstring for the
    exactness and overflow arguments.

    Driver tier (r5, the ``connected_components`` move): near-dup
    citation graphs are tiny even on a 100 TB corpus (edges ∝
    duplicates, not docs), so one partition-incremental ``take``
    both decides the strategy and delivers the edge list; the
    iteration then runs at the driver (integer sums — exactly the
    distributed recurrence) and the scores return as a broadcast
    local relation, replacing 2·iters join+agg stages with one map
    join. Graphs past the cap keep the distributed plan; the take's
    wasted work is bounded at ~cap rows. Set
    ``driver_graph_edges=0`` to force the distributed path."""
    e_proj = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    out_ids = nodes.select(F.col(id_col).alias("id"))
    if driver_graph_edges > 0:
        head = e_proj.take(driver_graph_edges + 1)
        if len(head) <= driver_graph_edges:
            spark = edges.sparkSession
            from pyspark.sql.types import LongType, StructField, StructType

            node_t = out_ids.schema["id"].dataType
            # h_0 is seeded from `nodes`, so the driver iterate needs
            # src ∈ nodes membership to match the distributed round-1
            # join exactly (r6, ADVICE): one column-pruned scan of
            # nodes semi-joined against the ≤cap distinct srcs; the
            # collect is bounded by the src count, never |nodes|.
            # r7: skipped under the caller's nodes_cover_edges
            # contract (see pagerank.py) — the probe measured
            # +0.33 s/call at sf0.1 and proves a structural fact at
            # the registry call sites.
            srcs = sorted({r[0] for r in head})
            members: set = set()
            if nodes_cover_edges:
                members = set(srcs)
            elif srcs:
                src_df = spark.createDataFrame(
                    [(s,) for s in srcs],
                    StructType([StructField("id", node_t)]),
                )
                members = {
                    r[0]
                    for r in out_ids.join(
                        F.broadcast(src_df), "id", "leftsemi"
                    ).collect()
                }
            rows = _hits_local(head, iters, members)
            local = spark.createDataFrame(
                rows,
                StructType(
                    [
                        StructField("id", node_t),
                        StructField("authority", LongType()),
                        StructField("hub", LongType()),
                    ]
                ),
            )
            return (
                out_ids.join(F.broadcast(local), "id", "left")
                .select(
                    "id",
                    F.coalesce("authority", F.lit(0))
                    .cast("bigint")
                    .alias("authority"),
                    F.coalesce("hub", F.lit(0)).cast("bigint").alias("hub"),
                )
            )
    # pin the edge relation once (the pagerank.py move): it is joined
    # 2×iters times, and without the cut its upstream lineage (LSH
    # banding on real call sites) re-executes per half-round —
    # measured 3.4 → 2.3 s on gr3 @ sf0.1
    e = e_proj.localCheckpoint(eager=True)
    h = nodes.select(
        F.col(id_col).alias("id"), F.lit(1).cast("bigint").alias("s")
    )
    a = None
    for _ in range(iters):
        a = (
            e.join(h, e["src"] == h["id"])
            .groupBy("dst")
            .agg(F.sum("s").alias("s2"))
            .select(F.col("dst").alias("id"), F.col("s2").alias("s"))
        )
        h = (
            e.join(a, e["dst"] == a["id"])
            .groupBy("src")
            .agg(F.sum("s").alias("s2"))
            .select(F.col("src").alias("id"), F.col("s2").alias("s"))
        )
    out = nodes.select(F.col(id_col).alias("id"))
    a_f = a.select("id", F.col("s").alias("authority"))
    h_f = h.select("id", F.col("s").alias("hub"))
    return (
        out.join(a_f, "id", "left")
        .join(h_f, "id", "left")
        .select(
            "id",
            F.coalesce("authority", F.lit(0)).cast("bigint").alias(
                "authority"
            ),
            F.coalesce("hub", F.lit(0)).cast("bigint").alias("hub"),
        )
    )
