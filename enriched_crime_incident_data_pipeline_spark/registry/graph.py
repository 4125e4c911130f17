"""Graph family (gr*): PageRank, HITS, triangles, label propagation over near-dup graphs.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import lsh_candidate_pairs, minhash_bands
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _GR1_PAGERANK_SQL,
    _GR7_SCC_SQL,
    _GR8_PPR_SQL,
    _GR10_BFS_SQL,
    _GR12_RECIPROCITY_SQL,
    _GR13_ASSORT_SQL,
    _GR2_SQL,
    _GR3_HITS_SQL,
    _MINHASH_BANDS_SQL,
)




def q_gr1_pagerank(spark, sf_dir):
    # link-authority weighting for corpus curation (Common Crawl
    # publishes per-host centrality; crawl schedulers prioritize by
    # it): damped PageRank, 5 rounds, over the near-dup "citation"
    # graph — each LSH pair is an edge from the newer doc to the
    # older one it duplicates. Reproducible ordered-fold mode so the
    # doubles are bit-exact vs the oracle's unrolled iteration; the
    # production default is the map-side-combinable unordered sum
    # (see datapipe/pagerank.py docstring).
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    edges = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    # nodes = every doc_id and edges are LSH pairs OF doc_ids, so
    # node coverage holds by construction — skip the driver tier's
    # membership probe (r7; one whole Spark job per call otherwise)
    pr = pagerank(edges, nodes, iters=5, ordered=True, nodes_cover_edges=True)
    return pr.select(F.col("id").alias("doc_id"), F.col("rank").alias("pr"))


def q_gr2_pagerank_converged(spark, sf_dir):
    # PageRank with the r5 convergence early exit doing real work:
    # the link graph is a DAG (every doc points to doc_id DIV 16 —
    # a 16-ary ancestry tree), where rank mass only flows downward,
    # so the iterate reaches a BIT-EXACT fixpoint after depth+1
    # rounds and tol=0.0 stops there (~round 5-6 of the 8 budgeted;
    # the oracle's 8 unrolled rounds give the identical fixpoint, so
    # exactness is preserved by construction). Cyclic graphs (gr1)
    # converge only geometrically and run their full budget.
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.filter(F.col("doc_id") >= 1).select(
        F.col("doc_id").alias("src"),
        F.expr("doc_id DIV 16").alias("dst"),
    )
    nodes = docs.select(F.col("doc_id").alias("id"))
    # src = doc_id (filtered ≥1) and dst = doc_id DIV 16 which is a
    # doc_id whenever src is (ids are dense from 0) — coverage by
    # construction, probe skipped (r7)
    pr = pagerank(
        edges, nodes, iters=8, ordered=True, tol=0.0, nodes_cover_edges=True
    )
    return pr.select(F.col("id").alias("doc_id"), F.col("rank").alias("pr"))


def q_gr3_hits(spark, sf_dir):
    # HITS hub/authority over the near-dup citation graph (gr1's
    # edges: newer doc → older doc it duplicates). Integer power
    # iteration — no per-round normalization, so every score is an
    # exact BIGINT and the production unordered map-side-combinable
    # sum IS the bit-exact cross-engine aggregation (associativity;
    # see datapipe/hits.py for the overflow bound).
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.hits import (
        hits_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    edges = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    # LSH-pair endpoints are doc_ids ⊆ nodes — probe skipped (r7)
    out = hits_scores(edges, nodes, iters=4, nodes_cover_edges=True)
    return out.select(F.col("id").alias("doc_id"), "authority", "hub")


def q_gr4_triangles(spark, sf_dir):
    # triangle counting over the near-dup citation graph — the local
    # clustering signal a dedup-graph audit publishes (triangles ⇒
    # transitive duplicate families; pure pairs ⇒ chain/boilerplate
    # structure). Exact and integer: two self-equi-joins of the
    # canonicalized a<b edge list (wedge a<b<c closed by (a,c)) —
    # never an all-pairs product; each triangle counted once, then
    # exploded to its three corners for per-node counts.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    e = (
        lsh_candidate_pairs(minhash_bands(docs))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("doc_id")
    )
    return (
        corners.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


def q_gr11_modularity(spark, sf_dir):
    # community-QUALITY metric for gr5's partition — the number that
    # decides whether a community structure is real or noise:
    # per-community Newman modularity contribution, exact integers.
    # Q = Σ_c (e_c/m − (d_c/2m)²) becomes q_num_c = 4·m·e_c − d_c²
    # over the common denominator 4m² (never materialized: the
    # published column is the sign-safe micro-unit floor
    # q_num·10⁶ DIV 4m², plus the raw integer witnesses e_c, d_c,
    # n_c that carry exactness). m is a driver scalar (one count of
    # the pair relation); everything else is three hash joins on
    # node ids + community-domain aggregations; the pair relation is
    # lazily checkpointed (LPA + degrees + e_in all read it).
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        label_propagation_communities,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        lsh_candidate_pairs(minhash_bands(docs))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    comm = label_propagation_communities(pairs, rounds=3)
    m = pairs.count()
    dec = "decimal(38,0)"
    sym = pairs.select(F.col("a").alias("v")).unionAll(
        pairs.select(F.col("b").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    dc = (
        deg.join(comm, deg["v"] == comm["node"])
        .groupBy("community")
        .agg(F.sum("d").cast("bigint").alias("deg_sum"))
    )
    ca = comm.select(
        F.col("node").alias("a"), F.col("community").alias("comm_a")
    )
    cb = comm.select(
        F.col("node").alias("b"), F.col("community").alias("comm_b")
    )
    e_in = (
        pairs.join(ca, "a")
        .join(cb, "b")
        .filter(F.col("comm_a") == F.col("comm_b"))
        .groupBy(F.col("comm_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    nn = comm.groupBy("community").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    out = (
        nn.join(dc, "community", "left")
        .join(e_in, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            F.coalesce("deg_sum", F.lit(0)).cast("bigint").alias("deg_sum"),
        )
    )
    return out.select(
        "community",
        "n_nodes",
        "e_in",
        "deg_sum",
        F.expr(
            f"CAST(CASE WHEN 4 * CAST({m} AS {dec}) * e_in"
            f" - CAST(deg_sum AS {dec}) * deg_sum < 0"
            f" THEN -((-(4 * CAST({m} AS {dec}) * e_in"
            f"   - CAST(deg_sum AS {dec}) * deg_sum) * 1000000)"
            f"   DIV (4 * CAST({m} AS {dec}) * {m}))"
            f" ELSE ((4 * CAST({m} AS {dec}) * e_in"
            f"   - CAST(deg_sum AS {dec}) * deg_sum) * 1000000)"
            f"   DIV (4 * CAST({m} AS {dec}) * {m})"
            f" END AS BIGINT)"
        ).alias("q_micro"),
    )


def q_gr5_label_prop(spark, sf_dir):
    # community detection over the near-dup graph: synchronous
    # label propagation, 3 deterministic rounds ((count desc, label
    # asc) adoption — a pure function of the graph, unlike async
    # LPA). The DENSITY complement to dd9's connectivity clusters:
    # a bridge edge between two duplicate families keeps them one
    # CC component but two communities.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        label_propagation_communities,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs)).select("a", "b").distinct()
    out = label_propagation_communities(pairs, rounds=3)
    return out.select(F.col("node").alias("doc_id"), "community")


def q_graph1_tree_paths(spark, sf_dir):
    # recursive-CTE workload without a recursive CTE: decimal-digit
    # parent tree over custkeys (parent = key/10, root 0), resolved by
    # pointer doubling in ⌈log₂ depth⌉ joins; oracle is a true
    # DuckDB WITH RECURSIVE
    from enriched_crime_incident_data_pipeline_spark.operators.hierarchy import (
        tree_paths,
    )

    cust = load_table(spark, sf_dir, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("node"),
        F.floor(F.col("c_custkey") / 10).cast("long").alias("parent"),
    )
    return tree_paths(edges)

def q_gr6_kcore(spark, sf_dir):
    # k-core decomposition (Seidman 1983) of the near-dup graph: the
    # density band between dd9's pure connectivity and gr5's
    # communities — synchronous peeling drops every node whose degree
    # within the current survivor subgraph is < 2, repeated to
    # fixpoint (≤ 8 rounds — both engines run the identical
    # fixed-round recurrence; a peel past the fixpoint is a no-op,
    # so the engine's early exit stays exact). Tight duplicate
    # families (rings, cliques) survive; chains and stars peel away
    # — the audit signal for "is this cluster boilerplate or a true
    # family". Integer degrees + comparisons only: bit-exact.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        k_core,
    )

    docs = load_table(spark, sf_dir, "documents")
    return k_core(
        lsh_candidate_pairs(minhash_bands(docs)), k=2, rounds=8
    ).select(F.col("node").alias("doc_id"), "core_deg")


def _gr6_kcore_sql() -> str:
    # the same synchronous peel, unrolled: s_i = nodes whose degree
    # within s_{i-1}'s induced subgraph is >= k. Every CTE is
    # MATERIALIZED: `e` and each survivor set are referenced multiple
    # times per round, and DuckDB's default inlining would replicate
    # the bands self-join exponentially across the 8 unrolled rounds
    # (measured: fd exhaustion before it even planned).
    rounds = []
    for i in range(1, 9):
        rounds.append(f"""
                    e{i} AS MATERIALIZED (
                      SELECT a, b FROM e
                      WHERE a IN (SELECT v FROM s{i - 1})
                        AND b IN (SELECT v FROM s{i - 1})
                    ),
                    d{i} AS MATERIALIZED (
                      SELECT v, count(*) AS c FROM (
                        SELECT a AS v FROM e{i}
                        UNION ALL SELECT b AS v FROM e{i}
                      ) GROUP BY v
                    ),
                    s{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE c >= 2),""")
    return f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    e AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    s0 AS MATERIALIZED (SELECT a AS v FROM e UNION SELECT b AS v FROM e),
                    {''.join(rounds)}
                    ef AS MATERIALIZED (
                      SELECT a, b FROM e
                      WHERE a IN (SELECT v FROM s8)
                        AND b IN (SELECT v FROM s8)
                    ),
                    df AS (
                      SELECT v, count(*) AS c FROM (
                        SELECT a AS v FROM ef UNION ALL SELECT b AS v FROM ef
                      ) GROUP BY v
                    )
                    SELECT s8.v AS doc_id,
                           CAST(coalesce(df.c, 0) AS BIGINT) AS core_deg
                    FROM s8 LEFT JOIN df ON s8.v = df.v
                """


def q_gr7_scc(spark, sf_dir):
    # strongly connected components over a DIRECTED link graph — the
    # directed-reachability analogue of dd9's duplicate clusters
    # (CC/k-core/LPA are undirected; citation/link audits contract
    # mutual-reachability cycles). Graph: every doc sits on its
    # 16-bucket rotation cycle (lead-over-window, wrapping — no
    # data-dependent constants), LSH dup pairs add newer→older
    # "citation" chords, and pairs with (a+b)%3=0 add the forward
    # chord too (mutual dups) — those merge whole cycles into one
    # SCC, so the contraction logic does real work (sf0.1: 313
    # cycles → 225 SCCs, largest 576). Driver tier = iterative
    # Tarjan under the shared take cap; distributed tier = exact
    # f/b min-label peeling (see clusters.py docstring); sixth tier
    # in the shared driver==distributed property suite.
    from pyspark.sql import Window

    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        strongly_connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.expr("doc_id DIV 16")).orderBy("doc_id")
    rot = docs.select(
        F.col("doc_id").alias("src"),
        F.coalesce(
            F.lead("doc_id").over(w), F.first("doc_id").over(w)
        ).alias("dst"),
    )
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    back = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    fwd = pairs.filter((F.col("a") + F.col("b")) % 3 == 0).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    edges = rot.union(back).union(fwd)
    return strongly_connected_components(edges).select(
        F.col("node").alias("doc_id"), "scc_id"
    )


def q_gr8_personalized_pagerank(spark, sf_dir):
    # personalized PageRank over the near-dup citation graph: random
    # walks restart at the SEED docs (doc_id % 50 = 0 — the 2%
    # trusted set), so rank measures link-proximity to the seeds and
    # unreachable docs score exactly 0 — the crawl-frontier /
    # seed-expansion scorer (what a curator runs to grow a trusted
    # domain list). Ordered fold → bit-exact vs the unrolled oracle;
    # the seed relation broadcasts (seed sets are small by
    # construction); same driver tier as gr1.
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        personalized_pagerank,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    edges = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    nodes = docs.select(F.col("doc_id").alias("id"))
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("id")
    )
    out = personalized_pagerank(
        edges, nodes, seeds, iters=5, ordered=True, nodes_cover_edges=True
    )
    return out.select(F.col("id").alias("doc_id"), F.col("rank").alias("ppr"))


def q_gr12_reciprocity(spark, sf_dir):
    # directed-graph reciprocity — the citation-graph health metric
    # (what share of links are mutual?) over gr7's graph, where
    # mutual LSH chords exist by construction: r = |E ∩ E^T| / |E|
    # in integer bp. One distinct edge relation, one self-join on
    # the reversed key (hash join), two counts — no windows, no
    # per-node state; the rotation cycles contribute mutual edges
    # only for 2-node buckets, so the statistic is dominated by the
    # (a+b)%3 mutual-chord rule and is a real, data-dependent value.
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        _citation_raw_edges(docs)
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = edges.join(rev, ["src", "dst"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mutual")
    )
    tot = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return tot.crossJoin(F.broadcast(mutual)).select(
        "n_edges",
        "n_mutual",
        F.expr(
            "CAST((n_mutual * 10000) DIV n_edges AS BIGINT)"
        ).alias("reciprocity_bp"),
    )


def _citation_raw_edges(docs):
    """The family's shared fixture graph (gr7/gr13/gr14/gr15): a
    rotation cycle per 16-doc block (real distance-2 structure the
    clique-shaped dup graph lacks) plus the LSH dup edges, reversed,
    with every third pair also kept forward. Directed (src, dst) with
    self-loops removed; callers canonicalize/symmetrize as needed."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.expr("doc_id DIV 16")).orderBy("doc_id")
    rot = docs.select(
        F.col("doc_id").alias("src"),
        F.coalesce(
            F.lead("doc_id").over(w), F.first("doc_id").over(w)
        ).alias("dst"),
    )
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    back = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    fwd = pairs.filter((F.col("a") + F.col("b")) % 3 == 0).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return rot.union(back).union(fwd).filter(F.col("src") != F.col("dst"))


def q_gr16_component_size_histogram(spark, sf_dir):
    # the graph-side family-size report (r10; dd25 histograms LSH dup
    # clusters — this is the CITATION graph's connectivity profile,
    # the number that says whether the graph is one giant component
    # or shattered islands, which decides BFS frontier sizing and
    # partition-locality expectations): connected components of the
    # undirected citation graph, every doc counted (docs in no edge
    # are size-1 singletons via the same coalesce dd9 uses), then a
    # <=|sizes|-row histogram with node-mass shares. CC resolves in
    # the driver/single-task tier (edges ∝ near-dups + one cycle per
    # 16-doc block); the share window runs over the histogram only.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    raw = _citation_raw_edges(docs)
    e = (
        raw.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    cc = connected_components(e, "a", "b")
    comp = (
        docs.select("doc_id")
        .join(cc, docs["doc_id"] == cc["node"], "left")
        .select(F.coalesce("cluster_id", F.col("doc_id")).alias("comp"))
    )
    csize = comp.groupBy("comp").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    hist = csize.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_components")
    )
    return hist.select(
        F.col("sz").alias("component_size"),
        "n_components",
        (F.col("sz") * F.col("n_components")).cast("bigint").alias("n_nodes"),
        F.expr(
            "CAST((sz * n_components * 10000)"
            " DIV (sum(sz * n_components) OVER ()) AS BIGINT)"
        ).alias("node_share_bp"),
    )


def q_gr15_wedge_skew_audit(spark, sf_dir):
    # the operator that DECIDES gr14's max_mid_degree and
    # link_predict's cap: a degree-magnitude histogram of the
    # undirected citation graph with each bucket's share of the wedge
    # sum Σdeg² — the quantity the 2-hop/wedge joins actually pay.
    # Buckets are bit-lengths of the degree (integer-exact via binary
    # string length — no float log), so the output is ≤64 rows
    # whatever the graph; the only window is the share total over
    # that bucket relation. The r9 SCALING §gr14 table, first-class
    # and continuously queryable: when the top bucket's share grows,
    # cap the wedge mids.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    raw = _citation_raw_edges(docs)
    e = (
        raw.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = e.select(F.col("a").alias("u")).unionAll(
        e.select(F.col("b").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    b = deg.select(
        F.length(F.conv(F.col("deg").cast("string"), 10, 2))
        .cast("int")
        .alias("bucket"),
        "deg",
    )
    buckets = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("deg").cast("bigint").alias("sum_deg"),
        F.sum(F.col("deg") * F.col("deg")).cast("bigint").alias("sum_deg2"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return buckets.select(
        "bucket",
        "n_nodes",
        "sum_deg",
        "sum_deg2",
        F.expr(
            "CAST(shiftleft(2L, bucket - 1) - 1 AS BIGINT)"
        ).alias("bucket_max_deg"),
        F.sum("sum_deg2").over(wall).alias("_tot"),
    ).select(
        "bucket",
        "n_nodes",
        "sum_deg",
        "sum_deg2",
        "bucket_max_deg",
        F.expr("CAST((sum_deg2 * 10000) DIV _tot AS BIGINT)").alias(
            "deg2_share_bp"
        ),
    )


def q_gr14_two_hop_reach(spark, sf_dir):
    # friend-of-friend reach — the crawl-frontier / influence metric
    # that pairs with gr4's triangles (closed 2-paths) by counting
    # the OPEN ones: per node, distinct nodes at distance exactly 2
    # (reachable through a middle, not a direct neighbor, not self)
    # over gr7's UNDIRECTED citation graph — the rotation cycles give
    # real distance-2 structure (the plain LSH dup graph is cliques:
    # measured 0 open 2-paths at every SF, which is itself the er3
    # cohesion story). Two self-equi-joins of the symmetric edge list
    # + one anti-join against direct neighbors; work bounded by the
    # wedge sum Σ deg(mid)², never a cartesian — and on a power-law
    # graph the top hub owns that sum, so the operator
    # (datapipe/linkpred.py:two_hop_reach) carries link_predict's
    # opt-in max_mid_degree cap; unset here because the citation
    # graph is measured degree-flat (max-deg²/Σdeg² = 70/10/5 bp at
    # sf0.01/0.1/1, SCALING.md §r9) and the exact result is the
    # default result. Nodes with no 2-hop reach emit no row (cdc2's
    # absent-zero convention).
    from pyspark.sql import Window

    from enriched_crime_incident_data_pipeline_spark.datapipe.linkpred import (
        two_hop_reach,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = _citation_raw_edges(docs).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    return two_hop_reach(raw)


def q_gr13_assortativity(spark, sf_dir):
    # degree assortativity — the mixing-pattern audit a crawl/citation
    # graph gets before link-based quality propagation (assortative
    # graphs propagate labels well; disassortative hub-and-spoke
    # graphs don't): Pearson correlation of (deg(src), deg(dst)) over
    # gr7's directed edges, in EXACT integer arithmetic — decimal(38,0)
    # co-moments (stat6's machinery), published as sign + the
    # two-step-floored r² in bp (the overflow-safe idiom; num² itself
    # would overflow). Plan: the gr12 edge relation (lazily
    # checkpointed — degree build and the two joins read blocks, not
    # lineage), ONE degree groupBy over the 2|E|-row endpoint union,
    # two hash joins edge→degree, one 6-cell global reduce. No
    # windows over row domains; reduce state is 6 cells.
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        _citation_raw_edges(docs)
        .distinct()
        .localCheckpoint(eager=False)
    )
    dec = "decimal(38,0)"
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast(dec).alias("deg"))
    )
    xy = (
        edges.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("x")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("y")), "dst")
        .select("x", "y")
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    f = agg.select(
        "n",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("denx"),
        F.expr("n * syy - sy * sy").alias("deny"),
    )
    return f.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.expr(
            "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1"
            " ELSE 0 END AS INT)"
        ).alias("assort_sign"),
        F.expr(
            "CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0"
            " ELSE ((abs(num) * 10000 DIV denx) * abs(num)) DIV deny"
            " END AS BIGINT)"
        ).alias("r2_bp"),
    )


def q_gr10_bfs_distance(spark, sf_dir):
    # seed-proximity audit: DIRECTED hop distance from the trusted
    # seed set (doc_id % 50 = 0, gr8's seeds) over gr7's citation
    # graph (16-bucket rotation cycles + LSH chords), capped at 4
    # hops — "how many citation hops is every document from a vetted
    # domain", the crawl-horizon twin of gr8's random-walk proximity.
    # All 5 BFS layers are populated (seeded cycles walk 0→4; cycles
    # with no seed inside the horizon stay absent). Frontier BFS:
    # each round joins only the newly discovered layer against the
    # (lazily checkpointed, reused) edge relation; fixed rounds are
    # exact for dist<=4 by BFS layer order — no convergence
    # question, hence no driver tier.
    from pyspark.sql import Window

    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        bfs_hop_distances,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.expr("doc_id DIV 16")).orderBy("doc_id")
    rot = docs.select(
        F.col("doc_id").alias("src"),
        F.coalesce(
            F.lead("doc_id").over(w), F.first("doc_id").over(w)
        ).alias("dst"),
    )
    pairs = lsh_candidate_pairs(minhash_bands(docs))
    back = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    fwd = pairs.filter((F.col("a") + F.col("b")) % 3 == 0).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    edges = rot.union(back).union(fwd).distinct()
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("id")
    )
    out = bfs_hop_distances(edges, seeds, rounds=4)
    return out.select(F.col("id").alias("doc_id"), "dist")


def q_gr9_link_predict(spark, sf_dir):
    # common-neighbor link prediction — "suggest related docs" /
    # crawl-frontier ranking: non-adjacent pairs ranked by shared
    # neighborhood over a doc↔attribute bipartite graph (each doc
    # links to one hub per attribute family: doc_id mod 13 / 17 / 19
    # — a deterministic stand-in for domain/lang/topic facets) plus
    # the LSH dup pairs as the already-linked set the anti-join
    # removes. Wedges through doc mids rank hub-hub co-occurrence;
    # wedges through hub mids rank doc-doc affinity (common=3 ⇔
    # doc_ids congruent mod 13·17·19). All-integer scoring (count +
    # Jaccard in bp), TakeOrdered top-50 — see datapipe/linkpred.py
    # for the Σdeg(mid)² work bound and the skew story.
    from enriched_crime_incident_data_pipeline_spark.datapipe.linkpred import (
        link_predict,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r11 (guide §2.4, dd26 idiom): ONE documents scan + a 3-element
    # array explode emits all three hub-family edges — the union shape
    # re-scanned `documents` once per modulus (3 scans; plan evidence
    # in plans/r11/gr9_hub_edges_{before,after}.txt). Wall-neutral at
    # sf0.1 (the LSH + wedge join dominate — interleaved A/B 3.57 vs
    # 3.55) but strictly one corpus pass instead of three at scale.
    hub = docs.select(
        F.col("doc_id").alias("a"),
        F.explode(
            F.array(
                *[
                    (F.lit(1000000000 + 1000 * k) + F.col("doc_id") % k)
                    for k in (13, 17, 19)
                ]
            )
        ).alias("b"),
    )
    pairs = lsh_candidate_pairs(minhash_bands(docs)).select("a", "b")
    return link_predict(hub.union(pairs), k=50)


def q_gr17_transitivity(spark, sf_dir):
    # the GLOBAL clustering coefficient of the near-dup graph (r10):
    # C = 3·triangles / wedges — the one number that says whether
    # near-dup pairs come in transitive FAMILIES (C → 1: safe to
    # collapse clusters to one keeper, dd9/dd10's premise) or in
    # chains/boilerplate bridges (C → 0: cluster-collapse
    # over-merges; verify pairwise instead). gr4 counts the
    # triangles per node and gr15 prices the wedges — this is the
    # published ratio, exact integers end-to-end. The edge list is
    # pinned ONCE (eager checkpoint) and feeds all three aggregates;
    # the triangle pass is the canonical a<b<c two-join (never
    # all-pairs), wedges are Σ deg·(deg−1)/2 over the degree
    # relation, and the epilogue is a 1-row crossJoin of broadcast
    # scalars.
    docs = load_table(spark, sf_dir, "documents")
    e = (
        lsh_candidate_pairs(minhash_bands(docs))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    sym = e.select(F.col("a").alias("u")).unionAll(
        e.select(F.col("b").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    wed = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("deg * (deg - 1) DIV 2")), F.lit(0))
        .cast("bigint")
        .alias("n_wedges"),
    )
    ne = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    one = ne.crossJoin(F.broadcast(wed)).crossJoin(F.broadcast(tri))
    return one.select(
        "n_edges",
        "n_nodes",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CAST(CASE WHEN n_wedges = 0 THEN 0"
            " ELSE (n_triangles * 3 * 10000) DIV n_wedges END AS BIGINT)"
        ).alias("transitivity_bp"),
    )


QUERIES = {
    "gr17_transitivity": q_gr17_transitivity,
    "gr9_link_predict": q_gr9_link_predict,
    "gr6_kcore": q_gr6_kcore,
    "gr10_bfs_distance": q_gr10_bfs_distance,
    "gr12_reciprocity": q_gr12_reciprocity,
    "gr13_assortativity": q_gr13_assortativity,
    "gr15_wedge_skew_audit": q_gr15_wedge_skew_audit,
    "gr16_component_size_histogram": q_gr16_component_size_histogram,
    "gr14_two_hop_reach": q_gr14_two_hop_reach,
    "gr8_personalized_pagerank": q_gr8_personalized_pagerank,
    "gr7_scc": q_gr7_scc,
    "gr1_pagerank": q_gr1_pagerank,
    "gr3_hits": q_gr3_hits,
    "gr4_triangles": q_gr4_triangles,
    "gr5_label_prop": q_gr5_label_prop,
    "gr11_modularity": q_gr11_modularity,
    "gr2_pagerank_converged": q_gr2_pagerank_converged,
    "graph1_tree_paths": q_graph1_tree_paths,
}

def oracles() -> dict[str, str]:
    return {
        "gr9_link_predict": f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            lsh AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            hub AS (
              SELECT doc_id AS a, 1000013000 + doc_id % 13 AS b
              FROM documents
              UNION ALL
              SELECT doc_id, 1000017000 + doc_id % 17 FROM documents
              UNION ALL
              SELECT doc_id, 1000019000 + doc_id % 19 FROM documents
            ),
            und AS MATERIALIZED (
              SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
              FROM (SELECT a, b FROM hub UNION ALL SELECT a, b FROM lsh)
              WHERE a <> b
            ),
            adj AS (
              SELECT a AS mid, b AS nb FROM und
              UNION ALL SELECT b, a FROM und
            ),
            deg AS (SELECT mid, count(*) AS deg FROM adj GROUP BY 1),
            cand AS (
              SELECT l.nb AS u, r.nb AS v, count(*) AS common
              FROM adj l JOIN adj r
                ON l.mid = r.mid AND l.nb < r.nb
              GROUP BY 1, 2
            ),
            nc AS (
              SELECT c.* FROM cand c
              LEFT JOIN und e ON c.u = e.a AND c.v = e.b
              WHERE e.a IS NULL
            )
            SELECT nc.u, nc.v,
                   CAST(nc.common AS BIGINT) AS common_neighbors,
                   CAST(nc.common * 10000
                        // (du.deg + dv.deg - nc.common) AS BIGINT)
                     AS jaccard_bp
            FROM nc JOIN deg du ON nc.u = du.mid
                    JOIN deg dv ON nc.v = dv.mid
            ORDER BY common_neighbors DESC, jaccard_bp DESC, u, v
            LIMIT 50
""",
        "gr10_bfs_distance": _GR10_BFS_SQL,
        "gr12_reciprocity": _GR12_RECIPROCITY_SQL,
        "gr13_assortativity": _GR13_ASSORT_SQL,
        "gr16_component_size_histogram": f"""
                    WITH RECURSIVE bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    pairs AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    rot AS (
                      SELECT doc_id AS src,
                             coalesce(lead(doc_id) OVER w,
                                      first_value(doc_id) OVER w) AS dst
                      FROM documents
                      WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
                    ),
                    e AS MATERIALIZED (
                      SELECT DISTINCT least(src, dst) AS a,
                             greatest(src, dst) AS b
                      FROM (
                        SELECT src, dst FROM rot
                        UNION SELECT b AS src, a AS dst FROM pairs
                        UNION SELECT a AS src, b AS dst FROM pairs
                          WHERE (a + b) % 3 = 0
                      ) WHERE src <> dst
                    ),
                    edges AS (
                      SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e
                    ),
                    reach(node, label) AS (
                      SELECT DISTINCT a AS node, a AS label FROM edges
                      UNION
                      SELECT ed.a AS node, r.label FROM edges ed
                      JOIN reach r ON r.node = ed.b
                    ),
                    cc AS (
                      SELECT node, min(label) AS cluster_id
                      FROM reach GROUP BY node
                    ),
                    comp AS (
                      SELECT coalesce(cc.cluster_id, d.doc_id) AS comp
                      FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
                    ),
                    csize AS (
                      SELECT comp, CAST(count(*) AS BIGINT) AS sz
                      FROM comp GROUP BY comp
                    ),
                    hist AS (
                      SELECT sz, CAST(count(*) AS BIGINT) AS n_components
                      FROM csize GROUP BY sz
                    )
                    SELECT sz AS component_size, n_components,
                           CAST(sz * n_components AS BIGINT) AS n_nodes,
                           CAST((sz * n_components * 10000)
                                // (sum(sz * n_components) OVER ())
                             AS BIGINT) AS node_share_bp
                    FROM hist
""",
        "gr17_transitivity": f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            e AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            tri AS (
              SELECT CAST(count(*) AS BIGINT) AS n_triangles
              FROM e e1
              JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            deg AS (
              SELECT u, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT a AS u FROM e UNION ALL SELECT b AS u FROM e)
              GROUP BY u
            ),
            wed AS (
              SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT)
                       AS n_wedges
              FROM deg
            ),
            ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
            SELECT n_edges, n_nodes, n_wedges, n_triangles,
                   CAST(CASE WHEN n_wedges = 0 THEN 0
                        ELSE (n_triangles * 3 * 10000) // n_wedges END
                     AS BIGINT) AS transitivity_bp
            FROM ne, wed, tri
""",
        "gr15_wedge_skew_audit": f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    pairs AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    rot AS (
                      SELECT doc_id AS src,
                             coalesce(lead(doc_id) OVER w,
                                      first_value(doc_id) OVER w) AS dst
                      FROM documents
                      WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
                    ),
                    e AS MATERIALIZED (
                      SELECT DISTINCT least(src, dst) AS a,
                             greatest(src, dst) AS b
                      FROM (
                        SELECT src, dst FROM rot
                        UNION SELECT b AS src, a AS dst FROM pairs
                        UNION SELECT a AS src, b AS dst FROM pairs
                          WHERE (a + b) % 3 = 0
                      ) WHERE src <> dst
                    ),
                    sym AS (
                      SELECT a AS u FROM e UNION ALL SELECT b FROM e
                    ),
                    deg AS (
                      SELECT u, CAST(count(*) AS BIGINT) AS deg
                      FROM sym GROUP BY u
                    ),
                    bk AS (
                      SELECT CAST(length(bin(deg)) AS INTEGER) AS bucket, deg
                      FROM deg
                    ),
                    buckets AS (
                      SELECT bucket,
                             CAST(count(*) AS BIGINT) AS n_nodes,
                             CAST(sum(deg) AS BIGINT) AS sum_deg,
                             CAST(sum(deg * deg) AS BIGINT) AS sum_deg2
                      FROM bk GROUP BY bucket
                    )
                    SELECT bucket, n_nodes, sum_deg, sum_deg2,
                           CAST((2::BIGINT << (bucket - 1)) - 1 AS BIGINT)
                             AS bucket_max_deg,
                           CAST((sum_deg2 * 10000)
                                // (sum(sum_deg2) OVER ()) AS BIGINT)
                             AS deg2_share_bp
                    FROM buckets
""",
        "gr14_two_hop_reach": f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    pairs AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    rot AS (
                      SELECT doc_id AS src,
                             coalesce(lead(doc_id) OVER w,
                                      first_value(doc_id) OVER w) AS dst
                      FROM documents
                      WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
                    ),
                    e AS MATERIALIZED (
                      SELECT DISTINCT least(src, dst) AS a,
                             greatest(src, dst) AS b
                      FROM (
                        SELECT src, dst FROM rot
                        UNION SELECT b AS src, a AS dst FROM pairs
                        UNION SELECT a AS src, b AS dst FROM pairs
                          WHERE (a + b) % 3 = 0
                      ) WHERE src <> dst
                    ),
                    sym AS (
                      SELECT a AS u, b AS v FROM e
                      UNION ALL SELECT b AS u, a AS v FROM e
                    ),
                    two AS (
                      SELECT DISTINCT x.u, y.v AS w
                      FROM sym x JOIN sym y ON x.v = y.u
                      WHERE x.u <> y.v
                    ),
                    reach AS (
                      SELECT t.u, t.w FROM two t
                      LEFT JOIN sym d ON t.u = d.u AND t.w = d.v
                      WHERE d.u IS NULL
                    )
                    SELECT u AS doc_id, CAST(count(*) AS BIGINT)
                             AS two_hop_reach
                    FROM reach GROUP BY u
                """,
        "gr8_personalized_pagerank": _GR8_PPR_SQL,
        "gr7_scc": _GR7_SCC_SQL,
        "gr6_kcore": _gr6_kcore_sql(),
        "gr1_pagerank": _GR1_PAGERANK_SQL,
        "gr3_hits": _GR3_HITS_SQL,
        "gr4_triangles": f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    e AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    tri AS (
                      SELECT e1.a AS x, e1.b AS y, e2.b AS z
                      FROM e e1
                      JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
                    ),
                    corners AS (SELECT unnest([x, y, z]) AS doc_id FROM tri)
                    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
                    FROM corners GROUP BY doc_id
                """,
        "gr11_modularity": f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    e AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    sym AS (
                      SELECT a AS v, b AS u FROM e
                      UNION ALL SELECT b AS v, a AS u FROM e
                    ),
                    l0 AS (SELECT DISTINCT v AS node, v AS lab FROM sym),
                    n1 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l0 l ON s.u = l.node GROUP BY 1, 2),
                    l1 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n1)
                           WHERE rn = 1),
                    n2 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l1 l ON s.u = l.node GROUP BY 1, 2),
                    l2 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n2)
                           WHERE rn = 1),
                    n3 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l2 l ON s.u = l.node GROUP BY 1, 2),
                    l3 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n3)
                           WHERE rn = 1)
                    ,
                    m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
                    deg AS (SELECT v, count(*) AS d FROM sym GROUP BY v),
                    dc AS (
                      SELECT l.lab AS community,
                             CAST(sum(deg.d) AS HUGEINT) AS deg_sum
                      FROM deg JOIN l3 l ON deg.v = l.node GROUP BY 1
                    ),
                    e_in AS (
                      SELECT la.lab AS community,
                             CAST(count(*) AS HUGEINT) AS e_in
                      FROM e
                      JOIN l3 la ON e.a = la.node
                      JOIN l3 lb ON e.b = lb.node
                      WHERE la.lab = lb.lab GROUP BY 1
                    ),
                    nn AS (
                      SELECT lab AS community, count(*) AS n_nodes
                      FROM l3 GROUP BY 1
                    )
                    SELECT nn.community,
                           CAST(nn.n_nodes AS BIGINT) AS n_nodes,
                           CAST(coalesce(e_in.e_in, 0) AS BIGINT) AS e_in,
                           CAST(coalesce(dc.deg_sum, 0) AS BIGINT)
                             AS deg_sum,
                           CAST(CASE WHEN 4 * m.m * coalesce(e_in.e_in, 0)
                                     - coalesce(dc.deg_sum, 0)
                                       * coalesce(dc.deg_sum, 0) < 0
                                THEN -((-(4 * m.m * coalesce(e_in.e_in, 0)
                                      - coalesce(dc.deg_sum, 0)
                                        * coalesce(dc.deg_sum, 0)) * 1000000)
                                      // (4 * m.m * m.m))
                                ELSE ((4 * m.m * coalesce(e_in.e_in, 0)
                                      - coalesce(dc.deg_sum, 0)
                                        * coalesce(dc.deg_sum, 0)) * 1000000)
                                      // (4 * m.m * m.m)
                                END AS BIGINT) AS q_micro
                    FROM nn CROSS JOIN m
                    LEFT JOIN dc ON dc.community = nn.community
                    LEFT JOIN e_in ON e_in.community = nn.community
                """,
        "gr5_label_prop": f"""
                    WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
                    e AS MATERIALIZED (
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    sym AS (
                      SELECT a AS v, b AS u FROM e
                      UNION ALL SELECT b AS v, a AS u FROM e
                    ),
                    l0 AS (SELECT DISTINCT v AS node, v AS lab FROM sym),
                    n1 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l0 l ON s.u = l.node GROUP BY 1, 2),
                    l1 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n1)
                           WHERE rn = 1),
                    n2 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l1 l ON s.u = l.node GROUP BY 1, 2),
                    l2 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n2)
                           WHERE rn = 1),
                    n3 AS (SELECT s.v, l.lab, count(*) AS c
                           FROM sym s JOIN l2 l ON s.u = l.node GROUP BY 1, 2),
                    l3 AS (SELECT v AS node, lab FROM (
                             SELECT v, lab, row_number() OVER (
                               PARTITION BY v ORDER BY c DESC, lab) AS rn FROM n3)
                           WHERE rn = 1)
                    SELECT node AS doc_id, lab AS community FROM l3
                """,
        "gr2_pagerank_converged": _GR2_SQL,
        "graph1_tree_paths": """
                    WITH RECURSIVE walk AS (
                      SELECT c_custkey AS node, c_custkey AS cur,
                             CAST(0 AS INTEGER) AS d
                      FROM customer
                      UNION ALL
                      SELECT node, cur // 10 AS cur, d + 1 FROM walk
                      WHERE cur <> 0
                    )
                    SELECT node, CAST(0 AS BIGINT) AS root,
                           CAST(max(d) AS INTEGER) AS depth
                    FROM walk GROUP BY node
                """,
    }
