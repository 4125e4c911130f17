"""Link prediction over an undirected graph: common-neighbor /
Jaccard scoring of NON-adjacent pairs — the "suggest related docs /
grow the crawl frontier" primitive (co-citation and co-occurrence
graphs rank candidate links by shared neighborhoods long before any
learned model enters the pipeline).

Shape: candidate pairs come from the WEDGE relation (two adjacency
rows sharing a mid node), so work is Σ_mid deg(mid)² — never a
node-pair product. That sum is exactly the co-occurrence reality of
the graph: hub mids with degree d contribute d²/2 wedges, and at
100 TB the heavy mids dominate. Mitigations that preserve exactness:
AQE skew-join splitting on the wedge self-join (the mid key is the
skewed one), and pre-aggregating adjacency into sorted neighbor
blocks. ``max_mid_degree`` optionally DROPS mids above a degree cap
before wedging — the standard web-scale concession (a mid shared by
everyone predicts nothing) — documented as changing semantics, off
by default, and exact-tested in both modes.

Scoring stays integer end-to-end: ``common`` is a count, degrees are
counts, and ``jaccard_bp = ⌊10⁴·common / (deg_u + deg_v − common)⌋``
— no float anywhere, so results are bit-equal across engines and
partitionings. Top-k goes through orderBy+limit, which compiles to
TakeOrderedAndProject (per-partition top-k then a k-row merge),
never a global sort exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_predict(
    edges: DataFrame,
    k: int = 50,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Top-``k`` predicted links: non-adjacent node pairs ranked by
    common-neighbor count, then integer Jaccard, then ``(u, v)``.

    ``edges``: (a, b) rows, treated as undirected (canonicalized and
    deduplicated here; self-loops dropped). Returns
    ``(u, v, common_neighbors, jaccard_bp)`` with ``u < v``.
    """
    und = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # the canonical edge relation feeds FOUR consumers (both adj
        # arms, the degree count, the anti-join) — without a cut the
        # whole upstream edge derivation (e.g. an LSH banding join)
        # re-executes once per consumer; lazy so declaration costs
        # nothing until the first action
        .localCheckpoint(eager=False)
    )
    adj = und.select(F.col("a").alias("mid"), F.col("b").alias("nb")).union(
        und.select(F.col("b").alias("mid"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("mid").agg(F.count(F.lit(1)).alias("deg"))
    wedge_src = adj
    if max_mid_degree is not None:
        wedge_src = adj.join(
            deg.filter(F.col("deg") <= max_mid_degree).select("mid"), "mid"
        )
    left = wedge_src.select("mid", F.col("nb").alias("u"))
    right = wedge_src.select("mid", F.col("nb").alias("v"))
    # shuffle-hash hints: every structural join here is an equi-join
    # between relations with no useful sort order — a sort-merge
    # would sort the wedge relation (the Σdeg² term) for nothing
    cand = (
        left.join(right.hint("shuffle_hash"), "mid")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    new_links = cand.join(
        und.hint("shuffle_hash"),
        (cand["u"] == und["a"]) & (cand["v"] == und["b"]),
        "left_anti",
    )
    scored = (
        new_links.join(
            deg.select(F.col("mid").alias("u"), F.col("deg").alias("du"))
            .hint("shuffle_hash"),
            "u",
        )
        .join(
            deg.select(F.col("mid").alias("v"), F.col("deg").alias("dv"))
            .hint("shuffle_hash"),
            "v",
        )
        .select(
            "u",
            "v",
            F.col("common").cast("bigint").alias("common_neighbors"),
            F.expr("CAST(common * 10000 DIV (du + dv - common) AS BIGINT)")
            .alias("jaccard_bp"),
        )
    )
    return scored.orderBy(
        F.desc("common_neighbors"), F.desc("jaccard_bp"), "u", "v"
    ).limit(k)


def two_hop_reach(
    edges: DataFrame,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Per-node OPEN 2-path reach: distinct nodes at distance exactly
    2 (reachable through a middle, not a direct neighbor, not self)
    — the crawl-frontier / friend-of-friend metric gr4's triangles
    (CLOSED 2-paths) pairs with. ``edges``: (a, b) undirected rows
    (canonicalized here). Returns ``(doc_id, two_hop_reach)``; nodes
    with no 2-hop reach emit no row (the absent-zero convention).

    Work is the wedge sum Σ_mid deg(mid)² — exactly
    :func:`link_predict`'s cost shape, and at 100 TB a power-law
    graph's top hub makes ONE key quadratic (a deg-10⁶ hub is 10¹²
    wedges from one join key). ``max_mid_degree`` applies the same
    documented concession link_predict ships: drop mids above the
    cap before wedging — reach THROUGH a mega-hub is the least
    informative reach there is — off by default so the exact result
    is the default result. On the citation-graph fixture the skew
    term is measured flat (max-deg²/Σdeg² = 70/10/5 bp at
    sf0.01/0.1/1 — SCALING.md §r9), so the cap exists for the
    power-law case, not this one.
    """
    und = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # three consumers (two wedge arms + the direct anti-join):
        # pin so the upstream edge derivation runs once
        .localCheckpoint(eager=False)
    )
    adj = und.select(F.col("a").alias("mid"), F.col("b").alias("nb")).union(
        und.select(F.col("b").alias("mid"), F.col("a").alias("nb"))
    )
    wedge_src = adj
    if max_mid_degree is not None:
        deg = adj.groupBy("mid").agg(F.count(F.lit(1)).alias("deg"))
        wedge_src = adj.join(
            deg.filter(F.col("deg") <= max_mid_degree).select("mid"), "mid"
        )
    two = (
        wedge_src.select("mid", F.col("nb").alias("u"))
        .join(
            wedge_src.select("mid", F.col("nb").alias("w")).hint(
                "shuffle_hash"
            ),
            "mid",
        )
        .filter(F.col("u") != F.col("w"))
        .select("u", "w")
        .distinct()
    )
    direct = adj.select(F.col("mid").alias("u"), F.col("nb").alias("w"))
    return (
        two.join(direct.hint("shuffle_hash"), ["u", "w"], "left_anti")
        .groupBy(F.col("u").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("two_hop_reach"))
    )
