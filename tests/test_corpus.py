"""Corpus-preparation operators (datapipe/corpus.py): packing,
stratified sampling, boilerplate pruning, shard shuffling.

Key properties pinned here: results are deterministic and independent
of physical partitioning (the packing prefix-sum must agree with the
naive global-window formulation), and edge semantics (empty prunes,
boundary-spanning documents) are exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
    pack_assignments,
    prune_boilerplate,
    shuffle_shards,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_pack_concat_and_chunk_semantics(spark):
    # 3+4+5+2 tokens, budget 5: offsets 0,3,7,12 → packs 0,0,1,2
    docs = _docs(
        spark,
        [
            (0, "a b c", "s"),
            (1, "a b c d", "s"),
            (2, "a b c d e", "s"),
            (3, "a b", "s"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"])
        for r in pack_assignments(docs, budget=5, n_buckets=2).collect()
    }
    assert got == {0: (3, 0, 0), 1: (4, 3, 0), 2: (5, 7, 1), 3: (2, 12, 2)}


def test_pack_matches_global_window_and_partitioning_invariant(spark):
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * ((i * 7) % 11 + 1)), "s") for i in range(97)],
    )
    # naive single-window formulation (what the two-phase sum replaces)
    from enriched_crime_incident_data_pipeline_spark.functions.text import token_count

    t = docs.select("doc_id", token_count(F.col("text")).cast("bigint").alias("n"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: r["off"]
        for r in t.withColumn(
            "off", F.coalesce(F.sum("n").over(w), F.lit(0))
        ).collect()
    }
    for nparts in (1, 7):
        got = {
            r["doc_id"]: r["start_offset"]
            for r in pack_assignments(
                docs.repartition(nparts), budget=64, n_buckets=5
            ).collect()
        }
        assert got == naive


def test_stratified_sample_rates_and_determinism(spark):
    docs = _docs(
        spark,
        [(i, "x", ["a", "b"][i % 2]) for i in range(400)],
    )
    kept = stratified_sample(docs, rates_bp={"a": 10000, "b": 0}).collect()
    # stratum a fully kept, stratum b fully dropped
    assert {r["source"] for r in kept} == {"a"}
    assert len(kept) == 200
    again = stratified_sample(docs.repartition(13), rates_bp={"a": 10000, "b": 0})
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in kept
    )


def test_prune_boilerplate_order_and_empty(spark):
    # 'the' is in 3/3 docs (df 100%) → pruned; doc 2 becomes empty
    docs = _docs(
        spark,
        [
            (0, "the quick fox the end", "s"),
            (1, "over the lazy dog", "s"),
            (2, "the the the", "s"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_kept"], r["pruned_text"])
        for r in prune_boilerplate(docs, df_pct_threshold=100).collect()
    }
    assert got == {
        0: (3, "quick fox end"),
        1: (3, "over lazy dog"),
        2: (0, ""),
    }


def test_shuffle_shards_positions_and_salt(spark):
    docs = _docs(spark, [(i, "x", "s") for i in range(100)])
    out = shuffle_shards(docs, n_shards=4).collect()
    assert len(out) == 100
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    # positions within each shard are exactly 1..k
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic across partitioning
    out2 = shuffle_shards(docs.repartition(9), n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # a different salt yields a different permutation
    other = shuffle_shards(docs, n_shards=4, salt="epoch-2").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_sliding_chunks_cover_and_overlap(spark):
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        sliding_chunks,
    )

    docs = _docs(
        spark,
        [
            (0, " ".join(f"t{i}" for i in range(10)), "s"),  # 10 toks → 1 chunk
            (1, " ".join(f"t{i}" for i in range(40)), "s"),  # 40 toks → 3 chunks
            (2, "", "s"),                                     # empty → 0 chunks
        ],
    )
    out = sliding_chunks(docs, chunk_tokens=16, stride=12).collect()
    by_doc: dict[int, dict[int, tuple[str, int]]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
            r["chunk_text"],
            r["n_chunk_tokens"],
        )
    assert 2 not in by_doc
    assert list(by_doc[0]) == [0] and by_doc[0][0][1] == 10
    assert sorted(by_doc[1]) == [0, 1, 2]
    # chunk 1 starts at token 12 (0-based): overlap of 4 with chunk 0
    assert by_doc[1][1][0].split()[0] == "t12"
    assert by_doc[1][2] == ("t24 t25 t26 t27 t28 t29 t30 t31 t32 t33 t34 t35 t36 t37 t38 t39", 16)


def test_group_sample_k_per_group_deterministic(spark):
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        group_sample,
    )

    docs = _docs(spark, [(i, "x", f"g{i % 5}") for i in range(100)])
    out = sorted(map(tuple, group_sample(docs, k=3).collect()))
    per = {}
    for _, g in out:
        per[g] = per.get(g, 0) + 1
    assert per == {f"g{i}": 3 for i in range(5)}
    again = sorted(map(tuple, group_sample(docs.repartition(11), k=3).collect()))
    assert again == out


def test_mixture_sample_exact_composition(spark):
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        mixture_sample,
    )

    docs = spark.createDataFrame(
        [(i, "A" if i < 10 else "B") for i in range(20)]
        + [(99, "C")],  # not in the target map → excluded
        "doc_id long, source string",
    )
    out = mixture_sample(docs, {"A": 7000, "B": 3000})
    got = [
        (r["source"], r["doc_id"]) for r in out.collect()
    ]
    by_src = {}
    for s, d in got:
        by_src.setdefault(s, set()).add(d)
    # caps: A=(10·10⁴)//7000=14, B=33 → T=14 → quotas 9 and 4
    assert len(by_src["A"]) == 9 and len(by_src["B"]) == 4
    assert "C" not in by_src
    # deterministic: a second run picks the same documents
    got2 = {(r["source"], r["doc_id"]) for r in
            mixture_sample(docs, {"A": 7000, "B": 3000}).collect()}
    assert got2 == set(got)


def test_corpus_build3_capstone_plan_and_invariants(spark):
    """The full pretraining-recipe DAG: final plan stays hash/broadcast
    joined (no cartesian/nested-loop anywhere downstream of the
    checkpointed stage boundaries), the sampled output obeys the
    60/30/10 mixture quota law, packing offsets are the exact prefix
    sum in doc_id order, and shard positions are dense ranks."""
    from collections import Counter

    from enriched_crime_incident_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["corpus_build3"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop joins are the broadcast SCALAR relations
    # (mixture's 1-row feasible-total, packing's 1-row max-id bound) —
    # every corpus-sized join stays a hash equi-join
    import re

    n_bnlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    assert n_bnlj <= 2, n_bnlj

    rows = df.collect()
    assert rows, "capstone output must be non-empty at sf0.001"
    # mixture law: one feasible total T explains every per-source count
    # as (T * t_bp) DIV 10000
    c = Counter(r.source for r in rows)
    assert set(c) <= set(registry.MIXTURE_TARGETS_BP)
    t_cands = range(
        (c["src0"] * 10000) // 6000, (c["src0"] * 10000) // 6000 + 3
    )
    assert any(
        all(
            c.get(s, 0) == (T * bp) // 10000
            for s, bp in registry.MIXTURE_TARGETS_BP.items()
        )
        for T in t_cands
    ), c
    # packing: offsets are the running sum of n_tokens in doc_id order
    ordered = sorted(rows, key=lambda r: r.doc_id)
    off = 0
    for r in ordered:
        assert r.start_offset == off, (r, off)
        assert r.pack_id == off // 256
        off += r.n_tokens
    # shards: positions within each shard are 1..k
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.position)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), (s, ps)


def test_budget_select_prefix_and_partitioning_invariant(spark):
    """budget_select must keep exactly the longest best-quality
    prefix fitting the budget, and the two-phase prefix sum must be
    independent of physical partitioning."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        budget_select,
    )

    rows = [(i, (i * 37) % 11 + 1, float((i * 53) % 17)) for i in range(40)]
    scored = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, mean_inv_prob double"
    )
    out = {
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in budget_select(scored, budget=60).collect()
    }
    # naive reference: sort by (quality, id), accumulate, cut
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    want, cum = set(), 0
    for d, n, _q in ordered:
        cum += n
        if cum > 60:
            break
        want.add((d, n, cum))
    assert out == want and want
    repart = {
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in budget_select(scored.repartition(7), budget=60).collect()
    }
    assert repart == out


def test_leakage_safe_split_never_straddles_clusters(spark):
    """Every near-dup candidate pair must land entirely in one split."""
    from enriched_crime_incident_data_pipeline_spark import registry

    qs = registry.spark_queries()
    df = qs["dc3_leakage_safe_split"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    split_of = {r.doc_id: r.split for r in rows}
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        lsh_candidate_pairs,
        minhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = lsh_candidate_pairs(minhash_bands(docs)).collect()
    assert pairs, "need candidate pairs at sf0.001 for the test to bite"
    for p in pairs:
        assert split_of[p.a] == split_of[p.b], p
        assert cluster_of[p.a] == cluster_of[p.b], p
    assert {"train", "eval"} >= set(split_of.values())


def test_global_order_index_matches_global_window(spark):
    """global_order_index == row_number() over the global order, for
    any monotone bucket granularity and any input partitioning."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        global_order_index,
    )

    rows = [(i, float((i * 37) % 11) + (i % 3) * 0.25) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double")
    w = Window.orderBy("score", "id")
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    for bucket in [
        F.floor(F.col("score")).cast("bigint"),
        F.floor(F.col("score") * 2).cast("bigint"),
        F.lit(0).cast("bigint"),  # degenerate: one bucket
    ]:
        got = {
            (r["id"], r["global_pos"])
            for r in global_order_index(
                df.repartition(7), ["score", "id"], bucket
            ).collect()
        }
        assert got == want


def test_temperature_sample_flattens_and_is_partitioning_invariant(spark):
    """tp12: the smallest stratum is kept whole, larger strata keep
    ~sqrt(n_min/n_s) of their docs, and the kept SET is a pure
    function of ids (same under any partitioning)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        temperature_sample,
    )

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
            for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_sample(docs).groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in kept}
    assert by.get("small") == 10  # rate 1: kept whole
    # big: n=900, rate sqrt(10/900) = 0.105 -> ~95 expected
    assert 55 <= by.get("big", 0) <= 140
    # mid: n=90, rate sqrt(10/90) = 0.333 -> ~30 expected
    assert 15 <= by.get("mid", 0) <= 48

    a = {tuple(r) for r in temperature_sample(docs).collect()}
    b = {tuple(r) for r in temperature_sample(docs.repartition(17)).collect()}
    assert a == b


def test_domain_upsample_multiplicity_law(spark):
    """tp14: per-doc multiplicity is floor(rate/10⁴) plus one iff the
    salted hash falls under the fraction — checked row-by-row against
    the hash; unlisted sources pass at exactly 1×; partitioning-
    invariant."""
    import hashlib

    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        domain_upsample,
    )

    rows = [(i, "A" if i % 3 == 0 else ("B" if i % 3 == 1 else "C"))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    rates = {"A": 25000, "B": 10500}
    out = domain_upsample(docs, rates).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["copy_idx"])
    for doc_id, src in rows:
        rate = rates.get(src, 10000)
        h = int(hashlib.md5(f"up:{doc_id}".encode()).hexdigest()[:8], 16)
        expect = rate // 10000 + (1 if h % 10000 < rate % 10000 else 0)
        assert sorted(got.get(doc_id, [])) == list(range(expect)), (
            doc_id, src, expect)
    rep = {(r["doc_id"], r["copy_idx"])
           for r in domain_upsample(docs.repartition(7), rates).collect()}
    assert rep == {(r["doc_id"], r["copy_idx"]) for r in out}


def test_tp16_mixture_curve_direction_and_anchors(spark):
    """Curve structure: the natural row reproduces raw shares; the
    flatten row moves every stratum's share TOWARD uniform (heavy
    down, light up); the sharpen row moves every share AWAY from
    uniform; each temperature's shares sum to ~10000 (floor loss
    < #strata)."""
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    rows = spark_queries()["tp16_mixture_curve"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_t = {}
    for r in rows:
        by_t.setdefault(r["temperature"], {})[r["stratum"]] = r
    nat = by_t["T=1_natural"]
    total = sum(r["n_docs"] for r in nat.values())
    for s, r in nat.items():
        assert r["share_bp"] == r["n_docs"] * 10000 // total
    uniform = 10000 // 3
    for s in nat:
        n_bp = nat[s]["share_bp"]
        f_bp = by_t["T=2_flatten"][s]["share_bp"]
        s_bp = by_t["T=0.5_sharpen"][s]["share_bp"]
        if n_bp > uniform:
            assert f_bp < n_bp < s_bp
        elif n_bp < uniform:
            assert f_bp > n_bp > s_bp
    for t, d in by_t.items():
        tot = sum(r["share_bp"] for r in d.values())
        assert 10000 - len(d) < tot <= 10000, t
