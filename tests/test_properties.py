"""Property-based pins (hypothesis): operators vs independent naive
models on randomized inputs — a rigor step beyond the reference's
smoke suite (SURVEY.md §5). Examples are few but adversarially
shrunk; derandomized for CI stability.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = dt.datetime(2026, 1, 1)


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 10)),
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_python_model(spark, lefts, rights):
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, _T0 + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(lefts)],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100 + j, k, _T0 + dt.timedelta(minutes=m), v)
            for j, (k, m, v) in enumerate(rights)
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(left, right, ["user_id"], "ts", "event_id").collect()
    }
    for i, (k, m) in enumerate(lefts):
        cands = [
            (mm, 100 + j)
            for j, (kk, mm, _) in enumerate(rights)
            if kk == k and mm <= m
        ]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
    )

    edf = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r["node"]: r["cluster_id"] for r in connected_components(edf).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(ns) for ns in comp.values() for n in ns}
    assert got == expected


@given(
    sizes=st.lists(st.integers(0, 9), min_size=1, max_size=30),
    budget=st.integers(2, 20),
)
@settings(**SETTINGS)
def test_pack_offsets_match_cumsum(spark, sizes, budget):
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        pack_assignments,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(sizes)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"])
        for r in pack_assignments(docs, budget=budget, n_buckets=3).collect()
    }
    off = 0
    for i, n in enumerate(sizes):
        assert got[i] == (n, off, off // budget)
        off += n


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=30
    )
)
@settings(**SETTINGS)
def test_dedup_by_key_keeps_exactly_one_per_key(spark, rows):
    from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
        dedup_by_key,
    )

    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "incident_num bigint, v bigint"
    )
    out = dedup_by_key(df, "incident_num")
    keys = [r["incident_num"] for r in out.select("incident_num").collect()]
    assert sorted(keys) == sorted({k for k, _ in rows})


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    ),
    radius=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_grid_proximity_equals_naive_theta(spark, pts, radius):
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        grid_proximity_join,
    )

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid int, x int, y int")
    got = sorted(
        (r["id_a"], r["id_b"], r["dx"], r["dy"])
        for r in grid_proximity_join(df, "pid", "x", "y", radius).collect()
    )
    want = sorted(
        (a, b, xb - xa, yb - ya)
        for (a, xa, ya) in rows
        for (b, xb, yb) in rows
        if a < b and abs(xa - xb) <= radius and abs(ya - yb) <= radius
    )
    assert got == want


@given(
    dim=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)), max_size=10),
    facts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)),
        min_size=1,
        max_size=10,
    ),
)
@settings(**SETTINGS)
def test_scd2_containment_equals_asof(spark, dim, facts):
    """Point-in-interval lookup over SCD2 versions ≡ as-of join on
    the raw version events (two independent formulations)."""
    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_join,
    )
    from enriched_crime_incident_data_pipeline_spark.operators.scd import (
        scd2_intervals,
    )

    dim_rows = [
        (i, u, _T0 + dt.timedelta(minutes=m), float(i)) for i, (u, m) in enumerate(dim)
    ]
    fact_rows = [
        (1000 + i, u, _T0 + dt.timedelta(minutes=m))
        for i, (u, m) in enumerate(facts)
    ]
    dim_df = spark.createDataFrame(
        dim_rows, "dim_event_id long, user_id long, ts timestamp, dim_value double"
    )
    fact_df = spark.createDataFrame(
        fact_rows, "event_id long, user_id long, ts timestamp"
    )

    iv = scd2_intervals(dim_df, ["user_id"], "ts", "dim_event_id")
    contain = fact_df.join(
        iv,
        (fact_df["user_id"] == iv["user_id"])
        & (iv["valid_from"] <= fact_df["ts"])
        & (iv["valid_to"].isNull() | (fact_df["ts"] < iv["valid_to"])),
        "left",
    ).select(fact_df["event_id"], "dim_event_id")

    asof = asof_join(
        fact_df,
        dim_df.withColumnRenamed("dim_event_id", "event_id"),
        ["user_id"],
        "ts",
        "event_id",
    ).select("event_id", F.col("asof_event_id").alias("dim_event_id"))

    got = sorted(map(tuple, contain.collect()))
    want = sorted(map(tuple, asof.collect()))
    assert got == want


_LINE = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" /:-"
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() != "")


@given(
    pages=st.lists(
        st.lists(  # each page: blocks of 2-7 lines
            st.lists(_LINE, min_size=2, max_size=7),
            min_size=3,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(**SETTINGS)
def test_pdf_parse_matches_reference_on_random_blocks(spark, pages):
    """The engine block parser must agree with a verbatim replica of
    the reference algorithm on ARBITRARY page/block/line shapes —
    including 2-line blocks (pad underflow), >6-line blocks (partial
    merge), and embedded empty-line removal order. Skips page shapes
    where the reference itself would crash (block count too small for
    its unconditional pops)."""
    from tests.test_pdf_parse import _reference_extract, _to_blocks_df
    from enriched_crime_incident_data_pipeline_spark.sources.pdf import (
        parse_report_blocks,
    )

    # every block gets the trailing '' the splitter expects
    pages_txt = [
        ["\n".join(lines) + "\n" for lines in page] for page in pages
    ]
    # reference precondition: page 0 pops 3 blocks, last page pops 1
    if len(pages_txt[0]) < 3 or len(pages_txt[-1]) < 1:
        return
    expected = sorted(_reference_extract(pages_txt))
    got = sorted(
        [
            [
                r["datetime_str"],
                r["incident_num"],
                r["location"],
                r["nature"],
                r["incident_ori"],
            ]
            for r in parse_report_blocks(
                _to_blocks_df(spark, pages_txt)
            ).collect()
        ]
    )
    # reference pads sub-5 rows with None-less short lists; the engine
    # yields nulls for the missing tail — normalize before comparing
    expected = [row + [None] * (5 - len(row)) for row in expected]
    assert got == expected


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=9).map(
            lambda cs: " ".join(cs)
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(**SETTINGS)
def test_segment_dedup_matches_python_model(spark, texts):
    """Corpus-wide keep-first segment dedup vs an independent Python
    replay: same survivors, same rebuilt text, on arbitrary tiny
    corpora with heavy cross-document token overlap."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        segment_dedup,
    )

    seg_tokens = 2
    docs = [(i, t) for i, t in enumerate(texts)]
    seen: set[str] = set()
    expected: dict[int, tuple[int, str]] = {}
    for doc_id, text in docs:  # ascending doc_id == keep-first order
        toks = [t for t in text.split(" ") if t]
        segs = [
            " ".join(toks[i : i + seg_tokens])
            for i in range(0, len(toks), seg_tokens)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        if kept:
            expected[doc_id] = (len(kept), " ".join(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_kept"], r["deduped_text"])
        for r in segment_dedup(df, seg_tokens=seg_tokens).collect()
    }
    assert got == expected


@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=300), min_size=1, max_size=8
    )
)
@settings(**SETTINGS)
def test_dhash_kernel_matches_bit_model(spark, payloads):
    """mm5: the Arrow dHash kernel equals an independent pure-Python
    bit model on arbitrary byte payloads (empty, short, unaligned)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        dhash_signatures,
    )

    def model(content: bytes) -> int:
        if not content:
            return 0
        cells = [0] * 72
        for i, byte in enumerate(content):
            cells[i % 72] += byte
        h = 0
        for r in range(8):
            for c in range(8):
                if cells[r * 9 + c] > cells[r * 9 + c + 1]:
                    h |= 1 << (r * 8 + c)
        return h - (1 << 64) if h >= 1 << 63 else h

    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        schema="media_id long, content binary",
    )
    got = {
        r["media_id"]: r["dhash"] for r in dhash_signatures(media).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == model(p)


def test_keeper_encoding_contract_enforced(spark):
    """r5 ADVICE fix: keep_first_segment packs (id, seg_idx) into one
    long; ids outside [0, 2^42) previously overflowed silently into a
    WRONG keeper. Now the contract fails fast per-row."""
    import pytest
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        keep_first_segment,
    )

    ok = spark.createDataFrame(
        [(5, 0, b"h1"), (6, 1, b"h1")],
        "doc_id bigint, seg_idx int, seg_hash binary",
    )
    rows = keep_first_segment(ok).collect()
    assert [(r["doc_id"], r["seg_idx"]) for r in rows] == [(5, 0)]

    bad = spark.createDataFrame(
        [(1 << 42, 0, b"h1")], "doc_id bigint, seg_idx int, seg_hash binary"
    )
    with pytest.raises(Exception, match="packed-long contract"):
        keep_first_segment(bad).collect()
    neg = spark.createDataFrame(
        [(-1, 0, b"h1")], "doc_id bigint, seg_idx int, seg_hash binary"
    )
    with pytest.raises(Exception, match="packed-long contract"):
        keep_first_segment(neg).collect()


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=2,
        max_size=10,
    ),
)
@settings(**SETTINGS)
def test_contamination_kernel_matches_join_report(spark, docs):
    """The r5 in-row frozenset-kernel flag must equal the broadcast-
    join report's flag on ANY corpus (randomized short-token docs,
    every-other doc as the eval split, n=3 so collisions actually
    happen at this size)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        ngram_contamination,
        with_contamination_flag,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ev = df.filter(F.col("doc_id") % 2 == 0)
    train = df.filter(F.col("doc_id") % 2 == 1)
    report = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(train, ev, n=3).collect()
    }
    kernel = {
        r["doc_id"]: r["contaminated"]
        for r in with_contamination_flag(train, ev, n=3).collect()
    }
    assert kernel == report


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=25),
        min_size=1,
        max_size=6,
    ),
)
@settings(**SETTINGS)
def test_intradoc_dedup_matches_python_model(spark, docs):
    """dd18's kernel vs a naive per-doc Python model: segment at
    fixed 3-token offsets, keep first occurrences, rejoin."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        intradoc_segment_dedup,
    )
    from enriched_crime_incident_data_pipeline_spark.functions.text import (
        tokens,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # model over the ENGINE's own tokenization (the normalize/split
    # contract is pinned elsewhere)
    toks = {
        r["doc_id"]: list(r["t"])
        for r in df.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    got = {
        r["doc_id"]: r
        for r in intradoc_segment_dedup(df, seg_tokens=3).collect()
    }
    for i in toks:
        t = toks[i]
        segs = [" ".join(t[p : p + 3]) for p in range(0, max(len(t), 1), 3)]
        seen, kept = set(), []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i]["n_segs"] == len(segs)
        assert got[i]["n_kept"] == len(kept)
        assert got[i]["deduped_text"] == " ".join(kept)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=18,
    ).map(lambda es: [(a, b) for a, b in es if a != b]),
)
@settings(**SETTINGS)
def test_graph_driver_tiers_match_distributed(spark, edges):
    """r5 driver tiers on random multigraphs: HITS (integer-exact) and
    ordered PageRank (bit-exact) and LPA (comparisons-only) must
    return the same rows from the take-delivered driver iterate as
    from the forced-distributed plan. Edge endpoints range over
    0..12 while the node set is 0..9, so some srcs/dsts fall OUTSIDE
    `nodes` — pinning the r6 membership semantics (out-of-node srcs
    never seed or hold rank/hub state) across the tier boundary."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        label_propagation_communities,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.hits import (
        hits_scores,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    if not edges:
        return
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    nodes = spark.createDataFrame(
        [(i,) for i in range(10)], "id bigint"
    )
    h_drv = {
        tuple(r)
        for r in hits_scores(e, nodes, iters=2).collect()
    }
    h_dst = {
        tuple(r)
        for r in hits_scores(
            e, nodes, iters=2, driver_graph_edges=0
        ).collect()
    }
    assert h_drv == h_dst
    p_drv = {
        r["id"]: r["rank"]
        for r in pagerank(e, nodes, iters=3, ordered=True).collect()
    }
    p_dst = {
        r["id"]: r["rank"]
        for r in pagerank(
            e, nodes, iters=3, ordered=True, driver_graph_edges=0
        ).collect()
    }
    assert p_drv == p_dst
    pd_drv = {
        r["id"]: r["rank"]
        for r in pagerank(
            e, nodes, iters=3, ordered=True, dangling=True, tol=0.0
        ).collect()
    }
    pd_dst = {
        r["id"]: r["rank"]
        for r in pagerank(
            e,
            nodes,
            iters=3,
            ordered=True,
            dangling=True,
            tol=0.0,
            driver_graph_edges=0,
        ).collect()
    }
    # dangling parity is ~1 ulp, not bit-exact: the distributed
    # dangling-mass term is an unordered float sum (same contract as
    # test_graph_sketch's tier test)
    assert pd_drv.keys() == pd_dst.keys()
    for k in pd_drv:
        assert abs(pd_drv[k] - pd_dst[k]) < 1e-12, (k, pd_drv[k], pd_dst[k])
    und = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    l_drv = {
        tuple(r)
        for r in label_propagation_communities(und, rounds=2).collect()
    }
    l_dst = {
        tuple(r)
        for r in label_propagation_communities(
            und, rounds=2, driver_graph_edges=0
        ).collect()
    }
    assert l_drv == l_dst
    # connected components: driver union-find vs forced-distributed
    # min-label propagation (r6, closing the four-tier equivalence
    # suite — cc/pagerank/hits/lpa now share this one harness)
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
    )

    c_drv = {tuple(r) for r in connected_components(und).collect()}
    c_dst = {
        tuple(r)
        for r in connected_components(
            und, small_graph_edges=0, driver_graph_edges=0
        ).collect()
    }
    assert c_drv == c_dst
    # k-core: driver peel vs forced-distributed rounds (r6 — the
    # fifth tier in the shared equivalence suite)
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        k_core,
    )

    k_drv = {tuple(r) for r in k_core(und, k=2, rounds=8).collect()}
    k_dst = {
        tuple(r)
        for r in k_core(und, k=2, rounds=8, driver_graph_edges=0).collect()
    }
    assert k_drv == k_dst
    # SCC: driver Tarjan vs forced-distributed f/b min-label peeling
    # (r7 — the sixth tier in the shared equivalence suite), on the
    # DIRECTED edges, plus the defining property against a Python
    # reachability model: same scc_id ⟺ mutually reachable, and
    # scc_id = min member.
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        strongly_connected_components,
    )

    s_drv = {
        tuple(r) for r in strongly_connected_components(e).collect()
    }
    s_dst = {
        tuple(r)
        for r in strongly_connected_components(
            e, driver_graph_edges=0
        ).collect()
    }
    assert s_drv == s_dst
    # Python model: transitive closure by repeated squaring-free BFS
    nodes_e = {u for u, _ in edges} | {v for _, v in edges}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    reach = {}
    for s in nodes_e:
        seen = {s}
        stack = [s]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        reach[s] = seen
    model = {
        v: min(
            u
            for u in nodes_e
            if u == v or (u in reach[v] and v in reach[u])
        )
        for v in nodes_e
    }
    assert {n: c for n, c in s_drv} == model
    # personalized PageRank: driver vs forced-distributed (r7 — the
    # seventh tier), plus the defining zero-outside-seed-reach
    # property: a node not reachable from any seed scores exactly 0
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        personalized_pagerank,
    )

    seeds = spark.createDataFrame([(0,), (3,)], "id bigint")
    pp_drv = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            e, nodes, seeds, iters=3, ordered=True
        ).collect()
    }
    pp_dst = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            e, nodes, seeds, iters=3, ordered=True, driver_graph_edges=0
        ).collect()
    }
    assert pp_drv == pp_dst
    seed_reach = reach.get(0, {0}) | reach.get(3, {3}) | {0, 3}
    for n, r in pp_drv.items():
        if n not in seed_reach:
            assert r == 0.0, (n, r)
        elif n in (0, 3):
            assert r > 0.0


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=18,
    ).map(lambda es: [(a, b) for a, b in es if a != b]),
    dangling=st.booleans(),
)
@settings(**SETTINGS)
def test_nodes_cover_edges_contract_is_free(spark, edges, dangling):
    """r7: when every endpoint IS in `nodes` (endpoints 0..9 ⊆ node
    set 0..9), the ``nodes_cover_edges=True`` fast path (probe
    skipped; n_nodes fused or standalone) returns bit-identical rows
    to the probing default for both HITS and PageRank — including
    the dangling/tol variants that exercise the r7 fused
    count+membership single-job path on the probing side."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.hits import (
        hits_scores,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.pagerank import (
        pagerank,
    )

    if not edges:
        return
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id bigint")
    h_probe = {tuple(r) for r in hits_scores(e, nodes, iters=2).collect()}
    h_fast = {
        tuple(r)
        for r in hits_scores(
            e, nodes, iters=2, nodes_cover_edges=True
        ).collect()
    }
    assert h_probe == h_fast
    kw = dict(iters=3, ordered=True)
    if dangling:
        kw.update(dangling=True, tol=0.0)
    p_probe = {
        r["id"]: r["rank"] for r in pagerank(e, nodes, **kw).collect()
    }
    p_fast = {
        r["id"]: r["rank"]
        for r in pagerank(e, nodes, nodes_cover_edges=True, **kw).collect()
    }
    assert p_probe == p_fast


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 10)),
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_asof_directions_match_python_model(spark, lefts, rights):
    """forward/nearest as-of against the naive model: forward =
    least (ts, id) at-or-after; nearest = closer side, equidistant
    resolving backward (pandas semantics)."""
    from enriched_crime_incident_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(i, k, _T0 + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(lefts)],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100 + j, k, _T0 + dt.timedelta(minutes=m), v)
            for j, (k, m, v) in enumerate(rights)
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    fwd = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "event_id", direction="forward"
        ).collect()
    }
    near = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "event_id", direction="nearest"
        ).collect()
    }
    for i, (k, m) in enumerate(lefts):
        after = [
            (mm, 100 + j)
            for j, (kk, mm, _) in enumerate(rights)
            if kk == k and mm >= m
        ]
        before = [
            (mm, 100 + j)
            for j, (kk, mm, _) in enumerate(rights)
            if kk == k and mm <= m
        ]
        exp_f = min(after)[1] if after else None
        assert fwd[i] == exp_f, ("forward", i, k, m)
        bw = max(before) if before else None
        fw = min(after) if after else None
        if bw is None:
            exp_n = fw[1] if fw else None
        elif fw is None:
            exp_n = bw[1]
        elif (m - bw[0]) <= (fw[0] - m):
            exp_n = bw[1]
        else:
            exp_n = fw[1]
        assert near[i] == exp_n, ("nearest", i, k, m)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=20,
    ).map(lambda es: [(a, b) for a, b in es if a != b]),
)
@settings(**SETTINGS)
def test_kcore_defining_property(spark, edges):
    """Independent semantic pin for gr6 (beyond driver==distributed):
    at fixpoint (rounds ≫ |V| guarantees it), the returned node set S
    must satisfy the k-core DEFINITION — (a) every member's degree
    within S is ≥ k and equals the reported core_deg; (b) maximality:
    no peeled node has ≥ k neighbors in S (else it belonged in the
    core). Degrees counted with multigraph multiplicity, matching the
    operator's contract."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        k_core,
    )

    if not edges:
        return
    k = 2
    e = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r["node"]: r["core_deg"] for r in k_core(e, k=k, rounds=30).collect()}
    members = set(got)
    nodes = {x for ab in edges for x in ab}

    def deg_in(v, s):
        d = 0
        for a, b in edges:
            if a == v and b in s:
                d += 1
            if b == v and a in s:
                d += 1
        return d

    for v in members:
        assert got[v] == deg_in(v, members)
        assert got[v] >= k
    for v in nodes - members:
        assert deg_in(v, members) < k


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 80)),
        min_size=1,
        max_size=14,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 80)), max_size=14
    ),
    n=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_asof_topn_matches_python_model(spark, lefts, rights, n):
    """asof5's bucketed last-n join vs the naive model: for every
    left row, the n most recent right rows strictly preceding it in
    (ts, id) order within the lookback horizon, ranked most-recent
    first. Horizon chosen mid-range so matches regularly straddle
    the bucket boundary (the fan-out-into-next-bucket path)."""
    from enriched_crime_incident_data_pipeline_spark.operators.asof import (
        asof_topn,
    )

    lookback = 25  # seconds; ts spread over 80s → boundary crossings
    left = spark.createDataFrame(
        [
            (i, k, _T0 + dt.timedelta(seconds=m))
            for i, (k, m) in enumerate(lefts)
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100 + j, k, _T0 + dt.timedelta(seconds=m))
            for j, (k, m) in enumerate(rights)
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    got = sorted(
        (r["event_id"], r["rank"], r["prev_event_id"])
        for r in asof_topn(
            left, right, ["user_id"], "ts", "event_id",
            n=n, lookback_seconds=lookback,
        ).collect()
    )
    want = []
    for i, (k, m) in enumerate(lefts):
        cands = [
            (mm, 100 + j)
            for j, (kk, mm) in enumerate(rights)
            if kk == k
            and (mm, 100 + j) < (m, i)
            and mm >= m - lookback
        ]
        for rank, (_, rid) in enumerate(
            sorted(cands, reverse=True)[:n], start=1
        ):
            want.append((i, rank, rid))
    assert got == sorted(want)


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 12)),
        min_size=2,
        max_size=60,
    ).filter(lambda d: len({g for g, _ in d}) >= 2)
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ks_drift_matches_dense_grid_model(spark, data):
    # ks_drift evaluates sup|F_g - F| at only the group's own jump
    # points (two candidates per point); the model evaluates the
    # ECDF difference densely at every global point AND just before
    # it — if the candidate-point argument were wrong anywhere (ties,
    # gaps, first/last intervals), these would diverge.
    from fractions import Fraction

    from enriched_crime_incident_data_pipeline_spark.operators.health import (
        ks_drift,
    )

    df = spark.createDataFrame(
        [(f"g{g}", x) for g, x in data], "source string, x bigint"
    )
    got = {
        r["source"]: (r["n_rows"], r["ks_bp"])
        for r in ks_drift(df, "source", "x").collect()
    }
    xs_all = [x for _, x in data]
    pts = sorted(set(xs_all))
    grid = [p - 1 for p in pts] + pts + [pts[-1] + 1]
    n = len(xs_all)
    for gname in {f"g{g}" for g, _ in data}:
        xs_g = [x for g, x in data if f"g{g}" == gname]
        n_g = len(xs_g)
        sup = max(
            abs(
                Fraction(sum(1 for v in xs_g if v <= t), n_g)
                - Fraction(sum(1 for v in xs_all if v <= t), n)
            )
            for t in grid
        )
        assert got[gname] == (n_g, int(sup * 10000))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)),
        min_size=3,
        max_size=40,
    ),
    cap=st.sampled_from([None, 2, 4]),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_link_predict_matches_python_model(spark, edges, cap):
    # wedge-join + anti-join + integer Jaccard == the set-algebra
    # definition, in BOTH exact and degree-capped modes (the cap
    # drops wedge MIDS only; degrees in the Jaccard stay full-graph)
    from enriched_crime_incident_data_pipeline_spark.datapipe.linkpred import (
        link_predict,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "a bigint, b bigint")
    k = 1000  # no truncation: compare the full candidate set
    got = sorted(
        (r["u"], r["v"], r["common_neighbors"], r["jaccard_bp"])
        for r in link_predict(df, k=k, max_mid_degree=cap).collect()
    )

    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in nbrs.items()}
    mids = [
        m for m in nbrs if cap is None or deg[m] <= cap
    ]
    common: dict[tuple[int, int], int] = {}
    for m in mids:
        ns = sorted(nbrs[m])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                common[p] = common.get(p, 0) + 1
    want = sorted(
        (
            u,
            v,
            c,
            c * 10000 // (deg[u] + deg[v] - c),
        )
        for (u, v), c in common.items()
        if (u, v) not in und
    )
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)),
        min_size=3,
        max_size=40,
    ),
    cap=st.sampled_from([None, 2, 4]),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_two_hop_reach_matches_python_model(spark, edges, cap):
    # open-2-path reach == the set-algebra definition in BOTH exact
    # and hub-capped modes: the cap drops wedge MIDS only (reach
    # through a mega-hub is the concession), direct-neighbor
    # exclusion stays full-graph; r9 verdict item 5's honesty
    # upgrade for gr14.
    from enriched_crime_incident_data_pipeline_spark.datapipe.linkpred import (
        two_hop_reach,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "a bigint, b bigint")
    got = {
        (r["doc_id"], r["two_hop_reach"])
        for r in two_hop_reach(df, max_mid_degree=cap).collect()
    }

    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    mids = [
        m for m in nbrs if cap is None or len(nbrs[m]) <= cap
    ]
    reach: dict[int, set[int]] = {}
    for m in mids:
        for u in nbrs[m]:
            for w in nbrs[m]:
                if u != w and w not in nbrs[u]:
                    reach.setdefault(u, set()).add(w)
    want = {(u, len(ws)) for u, ws in reach.items() if ws}
    assert got == want


def test_bfs_hop_distances_matches_python_model(spark):
    """Frontier BFS == textbook BFS on adversarial random directed
    graphs: cycles, multi-edges, self-loops, seeds inside and outside
    cycles, nodes beyond the horizon absent, unreachable nodes
    absent — and the fixed-round cap truncates, never mislabels."""
    import random
    from collections import deque

    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        bfs_hop_distances,
    )

    rng = random.Random(1234)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(40, 90))
        ]
        # a guaranteed long chain so layers past round 4 exist
        edges += [(i, i + 1) for i in range(50, 59)]
        seeds = sorted(rng.sample(range(n), 5)) + [50]
        rounds = 4

        e_df = spark.createDataFrame(edges, "src long, dst long")
        s_df = spark.createDataFrame([(s,) for s in set(seeds)], "id long")
        got = {
            r["id"]: r["dist"]
            for r in bfs_hop_distances(e_df, s_df, rounds=rounds).collect()
        }

        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        dist = {s: 0 for s in set(seeds)}
        dq = deque(dist)
        while dq:
            u = dq.popleft()
            if dist[u] >= rounds:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        assert got == dist, f"trial {trial}"


@given(
    base=st.lists(
        st.text(alphabet="abcdef", min_size=7, max_size=12),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    edit_pos=st.integers(min_value=1, max_value=6),
    edit_kind=st.sampled_from(["sub", "del", "ins"]),
    data=st.data(),
)
@settings(**SETTINGS)
def test_deletion_blocking_complete_for_suffix_window_edits(
    spark, base, edit_pos, edit_kind, data
):
    """er4's completeness claim, adversarially: take a random name,
    apply ONE random edit (substitution / deletion / insertion) at a
    random position within the last 6 characters, and the
    deletion-variant blocking MUST produce the pair — for every
    generated case, not just the crafted fixture."""
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        deletion_variant_pairs,
    )

    name = base[0]
    if edit_kind == "ins":
        # insertion contract: the site must be within the last
        # `window` positions of the LONGER (edited) string — an
        # insertion at exactly −window of the shorter lands at
        # −(window+1) of the longer (hypothesis found the boundary)
        edit_pos = min(edit_pos, 5)
    pos = len(name) - edit_pos  # 0-indexed edit site in the window
    if edit_kind == "sub":
        new_ch = data.draw(
            st.sampled_from([c for c in "abcdef" if c != name[pos]])
        )
        edited = name[:pos] + new_ch + name[pos + 1 :]
    elif edit_kind == "del":
        edited = name[:pos] + name[pos + 1 :]
    else:  # insertion inside the window
        new_ch = data.draw(st.sampled_from("abcdef"))
        edited = name[:pos] + new_ch + name[pos:]
    if edited == name:
        return
    rows = [(i + 10, nm) for i, nm in enumerate(base)] + [(1, edited)]
    df = spark.createDataFrame(rows, "id long, nm string")
    got = {
        (r["id_a"], r["id_b"])
        for r in deletion_variant_pairs(df, "id", "nm", 1, window=6).collect()
    }
    assert (1, 10) in got
