"""Scale-path operators: date-partitioned gold storage (partition
pruning) and salted two-phase aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.operators.skew import (
    salted_agg,
    salted_count,
)
from enriched_crime_incident_data_pipeline_spark.sinks.output import (
    read_incidents_partitioned,
    write_incidents_partitioned,
)
from enriched_crime_incident_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    from enriched_crime_incident_data_pipeline_spark.operators.derive import (
        to_silver,
    )
    from enriched_crime_incident_data_pipeline_spark.plans.events_adapter import (
        events_as_incidents_raw,
    )

    silver = to_silver(
        events_as_incidents_raw(load_table(spark, SF_DIR, "events"))
    )
    path = str(tmp_path / "gold")
    write_incidents_partitioned(silver, path)

    gold = read_incidents_partitioned(spark, path)
    days = [r[0] for r in gold.select("incident_date").distinct().collect()]
    assert len(days) > 1
    one_day = gold.filter(F.col("incident_date") == F.lit(days[0]))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the date predicate must prune at the directory listing, never
    # reach the row-level data filters
    assert "PartitionFilters: [isnotnull(incident_date" in plan
    expected = silver.filter(
        F.to_date("incident_ts") == F.lit(days[0])
    ).count()
    assert one_day.count() == expected


def test_salted_count_matches_groupby(spark):
    e = load_table(spark, SF_DIR, "events")
    direct = {
        (r["event_type"],): r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["event_type"],): r["cnt"]
        for r in salted_count(e, "event_type", n_salts=8).collect()
    }
    assert salted == direct


def test_salted_agg_matches_groupby(spark):
    e = load_table(spark, SF_DIR, "events")
    direct = sorted(
        map(
            tuple,
            e.groupBy("event_type")
            .agg(
                F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
                F.max("user_id").alias("peak_user"),
            )
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_agg(
                e,
                "event_type",
                {
                    "_s": F.sum(F.col("value").cast("decimal(18,2)")),
                    "_m": F.max("user_id"),
                },
                {"total": F.sum("_s"), "peak_user": F.max("_m")},
                n_salts=8,
            ).collect(),
        )
    )
    assert salted == direct


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from enriched_crime_incident_data_pipeline_spark.sinks.bucketed import (
        write_bucketed,
    )

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path / 'wh'}'"
    )
    # at sf0.001 AQE would broadcast the small side; disable so the
    # test exercises the big-fact-join scenario bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders")
        write_bucketed(li, "buckdb.li_b", "l_orderkey", n_buckets=8)
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "buckdb.ord_b",
            "l_orderkey",
            n_buckets=8,
        )
        joined = (
            spark.table("buckdb.li_b")
            .join(spark.table("buckdb.ord_b"), "l_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = joined.collect()
        assert sum(r["n"] for r in rows) == li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides arrive pre-hashed into matching buckets: the join
        # itself needs no Exchange (the only exchange is the groupBy's)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "SelectedBucketsCount" in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def test_salted_join_equals_plain_join(spark):
    from enriched_crime_incident_data_pipeline_spark.operators.skew import salted_join

    # hot key 1 dominates; include keys missing from each side
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901), (9, 902)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "cool"), (7, "unmatched")], "k int, label string"
    )
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "k", n_salts=4).collect()))
    assert salted == plain


def test_tpch_plans_broadcast_dims_and_push_filters(spark):
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    q5 = registry.spark_queries()["tpch_q5"](spark, sf)
    plan5 = q5._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan5  # nation/region dims broadcast

    q6 = registry.spark_queries()["tpch_q6"](spark, sf)
    scan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        q6._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in scan
    # every q6 predicate reaches the parquet reader
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"):
        assert frag in scan

    asof = registry.spark_queries()["asof_join"](spark, sf)
    plan_asof = asof._jdf.queryExecution().executedPlan().toString()
    # exactly one hash exchange (the key shuffle) — no extra wides
    assert plan_asof.count("Exchange hashpartitioning") == 1


def test_new_op_plans_broadcast_and_stay_narrow(spark):
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # contamination: the eval-gram set must broadcast — the training
    # corpus never sort-merge-joins
    dc1 = qs["dc1_contamination"](spark, sf)
    plan = dc1._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # bloom probe: bit set broadcast to the probe side
    sk2 = qs["sk2_bloom"](spark, sf)
    plan = sk2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # trailing-90d range frame: one hash shuffle (custkey), one Window
    wa3 = qs["wa3_range_frame"](spark, sf)
    plan = wa3._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan

    # tf-idf: df/N relations broadcast back onto the posting list
    tfidf = qs["tfidf_top_terms"](spark, sf)
    plan = tfidf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling is the engine's runtime answer to hot
    keys (PLANS.md): build a join where one key holds ~all the mass
    and assert AQE marks/splits the skewed side at execution."""
    left = spark.range(200_000).selectExpr(
        "CASE WHEN id % 100 < 99 THEN 0 ELSE id END AS k", "id AS v"
    )
    right = spark.range(1000).selectExpr("id AS k", "id * 10 AS w")
    conf = spark.conf
    old = {
        "spark.sql.adaptive.skewJoin.enabled": conf.get(
            "spark.sql.adaptive.skewJoin.enabled", "true"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0"
        ),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
        ),
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        # forbid broadcast so the join actually shuffles both sides
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = left.join(right, "k")
        # execute THIS Dataset's QueryExecution (count() would build a
        # separate one and leave this plan un-finalized):
        # k=0 carries 198000 rows; k=99,199,…,999 match 10 more
        assert len(joined.collect()) == 198_010
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for key, val in old.items():
            conf.set(key, val)


def test_full_tpch_suite_plans_stay_hash_joined(spark):
    """The 7 suite-completing adapted TPC-H queries (q2 q9 q11 q12
    q16 q20 q21) must plan as hash joins — dims broadcast, facts
    shuffle on keys, and nothing degrades to a per-row nested loop.
    The one sanctioned nested-loop is q11's 1-row scalar-threshold
    broadcast cross join."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    for name in ("tpch_q2", "tpch_q9", "tpch_q12", "tpch_q16",
                 "tpch_q20", "tpch_q21"):
        plan = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name

    plan11 = qs["tpch_q11"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan11
    # supplier-nation probe side broadcasts into the lineitem scan
    assert "BroadcastHashJoin" in plan11

    # q16's NOT-IN exclusion must be a broadcast anti-join
    plan16 = qs["tpch_q16"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan16

    # q21 aggregates per order instead of EXISTS/NOT-EXISTS double
    # self-joins: the lineitem relation feeds two aggregates, joined
    # once on the order key — a bounded number of scans, no theta join
    plan21 = qs["tpch_q21"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan21 and "Cartesian" not in plan21


def test_dynamic_partition_pruning_on_date_dim_join(spark, tmp_path):
    """Star-schema runtime pruning: joining the date-partitioned gold
    table to a FILTERED date dimension must plan a dynamic-pruning
    subquery on the partition column — at 100 TB the fact scan lists
    only the dim-selected day directories, decided at runtime, without
    a literal date predicate in the query."""
    from enriched_crime_incident_data_pipeline_spark.operators.derive import (
        to_silver,
    )
    from enriched_crime_incident_data_pipeline_spark.plans.events_adapter import (
        events_as_incidents_raw,
    )

    silver = to_silver(
        events_as_incidents_raw(load_table(spark, SF_DIR, "events"))
    )
    path = str(tmp_path / "gold_dpp")
    write_incidents_partitioned(silver, path)
    gold = read_incidents_partitioned(spark, path)

    dates = [r[0] for r in gold.select("incident_date").distinct().collect()]
    assert len(dates) >= 3
    picked = sorted(dates)[:2]
    # a dim with MORE rows than selected: the selective filter on the
    # dim side is what makes runtime pruning worthwhile (and is a DPP
    # precondition); broadcast it so the fact stays the probe side
    dim = spark.createDataFrame(
        [(d, "audit") for d in picked]
        + [(d, "skip") for d in sorted(dates)[2:]],
        "d date, tag string",
    ).filter(F.col("tag") == "audit")

    joined = (
        gold.join(F.broadcast(dim), gold.incident_date == dim.d)
        .groupBy("tag")
        .count()
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    rows = {r["tag"]: r["count"] for r in joined.collect()}
    expected = gold.filter(F.col("incident_date").isin(picked)).count()
    assert rows == {"audit": expected} and expected > 0


def test_q15_reuses_revenue_exchange(spark):
    """`rev` feeds both the scalar max and the equality join-back;
    the shuffle must execute once (ReusedExchange), not re-scan the
    fact table per consumer — at 100 TB the difference is a full
    extra lineitem scan."""
    from enriched_crime_incident_data_pipeline_spark import registry

    df = registry.spark_queries()["tpch_q15"](spark, "/root/testdata/sf0.001")
    df.collect()  # AQE finalizes reuse at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_simhash_band_join_cardinality_stays_bounded(spark):
    """Hot-corpus guard for the 64-bit/16-bit-band SimHash: on 2000
    unrelated docs the pigeonhole candidate join must stay near-linear.
    With the old 8-bit bands (256 bucket values) the same corpus
    yields ~n²/512 candidates (~31k here) — quadratic at corpus
    scale; 16-bit bands keep it ~256× smaller. Also pins that the
    candidate generator is an equi-join, never a cartesian."""
    import random

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        simhash_bands,
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(5000)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(20))) for i in range(2000)],
        "doc_id long, text string",
    ).coalesce(8)

    sig = simhash_signatures(docs).persist()
    bands = simhash_bands(sig)
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select("l.doc_id", "r.doc_id")
    )
    n_cand = cand.count()
    # uniform 16-bit bands ⇒ E[candidates] ≈ 4·n²/(2·65536) ≈ 122;
    # 5×n is a loose ceiling that still rejects 8-bit banding by 15×
    assert n_cand < 5 * 2000, n_cand

    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # exact-verify face still correct on a corpus with one true dup
    dup = spark.createDataFrame(
        [(10_000, "alpha beta gamma delta"), (10_001, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    pairs = simhash_near_dup_pairs(docs.union(dup), max_hamming=3)
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((10_000, 10_001)) == 0
    sig.unpersist()


def test_simhash_wide_multiprobe_matches_narrow_and_shrinks_candidates(spark):
    """The r8 uniform-tail variant (32-bit bands + radius-1 probe)
    must (a) return EXACTLY the narrow generator's pairs — both are
    complete for Hamming ≤ 3 over identical signatures — and (b)
    generate strictly fewer candidate pairs than the 16-bit banding
    on an unrelated-docs corpus (the quadratic-tail insurance it
    exists for; 26× fewer measured on sf0.1, SCALING.md §r8), and
    (c) reject configurations whose probe radius would exceed 1."""
    import random

    import pytest

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        simhash_near_dup_pairs,
        simhash_near_dup_pairs_wide,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice(vocab) for _ in range(20))) for i in range(500)]
        + [
            (10_000, "alpha beta gamma delta"),
            (10_001, "alpha beta gamma delta"),
            (10_002, "alpha beta gamma zeta"),
        ],
        "doc_id long, text string",
    ).coalesce(8)

    narrow = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    wide = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_dup_pairs_wide(
            docs, max_hamming=3, band_bits=32
        ).collect()
    }
    assert wide == narrow
    assert wide.get((10_000, 10_001)) == 0

    with pytest.raises(ValueError, match="radius"):
        simhash_near_dup_pairs_wide(docs, max_hamming=7, band_bits=64)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs_wide(docs, max_hamming=3, band_bits=24)


def test_ngram_jaccard_max_df_prunes_hot_shingle(spark):
    """Stop-shingle skew guard: every doc shares one boilerplate
    shingle, so the uncapped self-join fans out n²/2 pairs from that
    single hot key. With max_df the hot shingle is pruned before the
    join — the pair count collapses to the genuinely-similar pairs,
    and surviving pairs keep their exact (unpruned-denominator)
    jaccard values."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        ngram_jaccard_pairs,
    )

    n = 200
    # "common header text" is a shingle in every doc; each doc also has
    # 5 unique words; docs 0/1 are true near-dups sharing rare content
    rows = [
        (i, f"common header text u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(2, n)
    ]
    rows += [
        (0, "common header text rare alpha beta gamma delta"),
        (1, "common header text rare alpha beta gamma epsilon"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)

    uncapped = ngram_jaccard_pairs(docs)
    capped = ngram_jaccard_pairs(docs, max_df=10)
    n_uncapped = uncapped.count()
    n_capped = capped.count()
    # hot shingle links every doc pair without the cap…
    assert n_uncapped == n * (n - 1) // 2
    # …and only content-sharing pairs with it (0,1 plus any pairs via
    # the boundary shingles around the shared prefix)
    assert n_capped < n
    cap_rows = {(r["a"], r["b"]): r for r in capped.collect()}
    unc_rows = {(r["a"], r["b"]): r for r in uncapped.collect()}
    assert (0, 1) in cap_rows
    for key, row in cap_rows.items():
        ref = unc_rows[key]
        # denominators are uncapped totals, so union_size matches the
        # exhaustive run; intersect may only shrink by pruned shingles
        assert row["union_size"] <= ref["union_size"] + (
            ref["intersect_size"] - row["intersect_size"]
        )
        assert row["intersect_size"] <= ref["intersect_size"]


def test_exact_blocked_matches_expression_path(spark):
    """The Arrow-batched block-pair cosine kernel must be BIT-equal to
    the expression-level sequential dot (zip_with + aggregate fold) —
    same pairs, identical doubles — across block counts, including
    blocks larger than the data and identical/zero vectors."""
    import random

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        exact_all_pairs_cosine,
    )
    from enriched_crime_incident_data_pipeline_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(17)]) for i in range(150)
    ]
    rows.append((150, list(rows[3][1])))  # exact duplicate vector
    rows.append((151, [0.0] * 17))  # zero vector → NULL cosine, dropped
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    vecs = emb.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_v"),
        l2_norm(F.col("embedding")).alias("_n"),
    )
    expr = (
        vecs.alias("l")
        .join(vecs.alias("r"), F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("a"),
            F.col("r._id").alias("b"),
            cosine_from_norms(
                F.col("l._v"), F.col("r._v"), F.col("l._n"), F.col("r._n")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.2)
    )
    expected = {(r["a"], r["b"]): r["cosine"] for r in expr.collect()}
    assert expected  # non-trivial case

    for n_blocks in (1, 4, 25):
        got = {
            (r["a"], r["b"]): r["cosine"]
            for r in exact_all_pairs_cosine(
                emb, threshold=0.2, n_blocks=n_blocks
            ).collect()
        }
        # bit-equality: dict equality on raw float64s, no tolerance
        assert got == expected, f"n_blocks={n_blocks}"
    # more blocks than vectors (empty tiles) + duplicate detection
    tiny = emb.filter(F.col("vec_id").isin([1, 2, 3, 150, 151]))
    dup = exact_all_pairs_cosine(tiny, threshold=0.999, n_blocks=16)
    assert (3, 150) in {(r["a"], r["b"]) for r in dup.collect()}


def test_changelog_and_lsh_family_plan_shapes(spark):
    """Scale invariants for the changelog/sequence/LSH family:
    single-shuffle folds stay single-shuffle, band joins never
    degrade to cartesian, and the one-row audit aggregates are the
    only single-partition exchanges."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    def shape(name):
        qe = qs[name](spark, sf)._jdf.queryExecution()
        return qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    import re

    # CDC fold: exactly one exchange (hash by key), no join, and the
    # max_by must pre-aggregate map-side (partial_max_by before it)
    p = shape("cdc1_upsert_merge")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:1500]
    assert "partial_max_by" in p
    assert "Join" not in p

    # interval coalescing: both windows + island agg share ONE hash
    # partitioning by key
    p = shape("ts3_interval_merge")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:1500]

    # hyperplane signatures: map-only except the bucket-size count
    p = shape("ss4_hyperplane_lsh")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:1500]
    assert "Join" not in p

    # banded pairs / basket pairs: equi-joins only — a cartesian or
    # nested loop here is the n² failure the banding exists to avoid
    for name in ("ss5_lsh_near_dup", "seq2_cooccurrence"):
        p = shape(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name

    # semantic dedup, asserted on the PAIR-GENERATION plan (since
    # round 4 the CC stage eagerly checkpoints, so dd14's final plan
    # no longer exposes the upstream joins): the only nested-loop
    # joins are the sanctioned broadcast-centroid crossJoins (16-row
    # build side); the pair generator itself must stay an
    # intra-cluster equi-join
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        embedding_near_dup_pairs,
    )
    from enriched_crime_incident_data_pipeline_spark.sources import load_table

    emb = load_table(spark, sf, "embeddings")
    pairs_qe = embedding_near_dup_pairs(
        emb, threshold=0.3, block_clusters=16
    )._jdf.queryExecution()
    p = pairs_qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in p
    # formatted mode: each tree reference reads
    # "BroadcastNestedLoopJoin Cross BuildRight (NN)" — every nested
    # loop must be a broadcast-build crossJoin (the 16-row centroid
    # relation), never a streamed fact-fact loop
    tree_refs = re.findall(r"BroadcastNestedLoopJoin[^\n(]*\(\d+\)", p)
    assert tree_refs, "expected the broadcast-centroid crossJoins"
    for ref in tree_refs:
        assert "Cross Build" in ref, ref
    # and the final dd14 plan stays loop/cartesian-free
    p = shape("dd14_semdedup")
    assert "CartesianProduct" not in p

    # audit: single-partition exchanges only for the 1-row check
    # totals; every lineitem/orders scan pushes its filter
    p = shape("dq1_constraint_audit")
    assert len(re.findall(r"Arguments: hashpartitioning", p)) <= 1
    assert len(re.findall(r"PushedFilters: \[[^\]]", p)) >= 4


def test_round2_ops_plan_shapes(spark):
    """Scale invariants for the round-2 operators: dimension tables
    broadcast, corpora never sort-merge-join or nested-loop, and the
    exchange counts stay fixed by query shape."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # LM scoring (r5 kernel shape): the count model is a broadcast
    # Python dict and the fold rides each row through ONE Arrow hop —
    # the scoring side has NO join node and NO shuffle of any kind
    # (the r4 shape broadcast-joined counts back per token; the r5
    # plan is strictly smaller: MapInPandas directly over the scan)
    p = qs["ta11_lm_quality"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Exchange hashpartitioning" not in p

    # segment dedup: keeper is a pure long-typed HashAggregate (the
    # min(struct) form would fall back to SortAggregate; a window
    # would shuffle+sort text) and the text re-enters only via the
    # doc-keyed rebuild join — no sort-based operator anywhere
    p = qs["dd11_segment_dedup"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in p and "WindowExec" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    # PQ coding: codebook broadcast; ADC joins codes to a broadcast LUT
    for name in ("ss7_pq_codes", "ss8_pq_adc_topk"):
        p = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name

    # blocked exact cosine: one shuffle on the tile key feeding the
    # Arrow kernel — no pairwise join node at all
    p = qs["dd6_embed_cosine"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p

    # keeper drop-list: argmax is an aggregation (max_by), keeper dim
    # broadcasts back
    p = qs["dd10_dedup_keeper"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in p
    assert "BroadcastHashJoin" in p


def test_ss10_ivf_pq_plan_and_semantics(spark):
    """Composed ANN (IVF probe → PQ-ADC shortlist → exact re-rank):
    (a) plan never evaluates a full-corpus pairwise distance — every
    join is broadcast (LUT, probed-cluster ids, shortlist, scalar
    query), no SortMergeJoin/CartesianProduct; (b) the answer equals
    exact-cosine top-k restricted to the probed clusters (the ADC
    shortlist is a pruning step, not an answer-changing one, at the
    test scale)."""
    from enriched_crime_incident_data_pipeline_spark import registry
    from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
        ivf_assignments,
    )
    from enriched_crime_incident_data_pipeline_spark.functions.vectors import (
        cosine_similarity,
    )
    from enriched_crime_incident_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    df = registry.spark_queries()["ss10_ivf_pq_search"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

    got = {r["neighbor_id"] for r in df.collect()}

    # independent reference: exact cosine top-10 within the 2 probed
    # clusters (probe = top-2 centroids by query cosine, centroids =
    # vec_id < 8, same tie-breaks)
    emb = load_table(spark, sf, "embeddings")
    q_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("_qv")
    )
    cent_cos = (
        emb.filter(F.col("vec_id") < 8)
        .crossJoin(F.broadcast(q_vec))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("_qv")).alias("c"),
        )
        .orderBy(F.desc("c"), "vec_id")
        .limit(2)
    )
    probed = {r["vec_id"] for r in cent_cos.collect()}
    assign = ivf_assignments(emb, 8)
    exact = (
        emb.join(assign, "vec_id")
        .filter(F.col("cluster").isin(list(probed)) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q_vec))
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("_qv")).alias("c"),
        )
        .orderBy(F.desc("c"), "vec_id")
        .limit(10)
    )
    want = {r["vec_id"] for r in exact.collect()}
    assert got == want


def test_repeated_spans_semantics_and_plan(spark):
    """dd13: two docs sharing a 14-token run → one maximal span each
    covering exactly those 14 tokens; a doc with no repeated window is
    absent; the plan has no pair self-join (window-count, not join)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        repeated_spans,
    )

    shared = " ".join(f"tok{i}" for i in range(14))
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one tail words here alpha"),
            (2, "lead in words " + shared),
            (3, " ".join(f"solo{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = repeated_spans(docs, win_tokens=10, min_count=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for did, start in [(1, 0), (2, 3)]:
        r = rows[did]
        assert r["n_dup_spans"] == 1
        # offsets 0..4 relative to the run's start are duplicated
        # (windows fully inside the shared 14 tokens): span covers
        # min_off .. max_off + 10 - 1 = 14 tokens
        assert r["dup_tokens"] == 14, (did, r)
        assert r["longest_span"] == 14

    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_repeated_spans_sampled_coverage_guarantee(spark):
    """dd13b: winnowed sampling must DETECT every duplicated region
    >= 3*winnow_w - 2 + win_tokens - 1 tokens (31 at defaults) — the
    deterministic coverage bound — and claim only real duplication.
    A 60-token shared run across two docs is well past the bound; the
    sampled spans must land inside the true duplicated extent and the
    no-duplicate doc must stay absent. Also: selection shrinks the
    count-shuffle input (the measured scale claim)."""
    import random

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        repeated_spans_sampled,
    )

    rng = random.Random(7)
    shared = " ".join(f"dup{rng.randrange(10**6)}" for _ in range(60))
    lead = " ".join(f"lead{i}" for i in range(17))
    tail = " ".join(f"tail{i}" for i in range(23))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + tail),
            (2, lead + " " + shared),
            (3, " ".join(f"solo{i}" for i in range(80))),
        ],
        "doc_id long, text string",
    )
    out = repeated_spans_sampled(docs, win_tokens=10, winnow_w=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    # detection: both copies reported, clean doc absent
    assert set(rows) == {1, 2}, rows
    for did, start, end in [(1, 0, 59), (2, 17, 76)]:
        r = rows[did]
        assert r["n_dup_spans"] == 1, (did, r)
        # sampled span is a lower bound nested inside the true extent
        assert 1 <= r["dup_tokens"] <= 60
        # it must cover a solid interior chunk: >= 60 - 2*(w-1) - ...
        # conservative: at least half the run at these parameters
        assert r["dup_tokens"] >= 30, (did, r)

    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_round4_ops_plan_shapes(spark):
    """Scale invariants for the round-4 operators: the salted agg
    really two-phases (two aggregate exchanges, no single hot
    reducer key), the salted join replicates the small side instead
    of nested-looping, and the z-order tiling is pure hash
    aggregation over deterministic prefix buckets."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # sj1: phase-1 groupBy (key, salt) then phase-2 groupBy key —
    # two Exchange+HashAggregate pairs, no sort-based aggregate
    p = qs["sj1_salted_hot_agg"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert p.count("HashAggregate") >= 4  # partial+final per phase
    assert "SortAggregate" not in p and "CartesianProduct" not in p

    # sj2: joins on (k, salt); never a nested loop over the big side
    p = qs["sj2_salted_join"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p

    # zo1: no join at all — one hash aggregation over the z-prefix
    p = qs["zo1_zorder_tiles"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p and "SortAggregate" not in p

    # dc4: eval grams broadcast; train side never sort-merge-joins
    p = qs["dc4_overlap_fraction"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_round4_addition_plans_stay_scale_shaped(spark):
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # sk5 rollup: fact side joins its dims broadcast; register merges
    # are plain hash aggregates — no sort-merge join anywhere
    sk5 = qs["sk5_hll_rollup"](spark, sf)
    plan = sk5._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # dc5: eval vector set broadcasts; corpus never shuffles to score
    dc5 = qs["dc5_semantic_decontaminate"](spark, sf)
    plan = dc5._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    # ret2: the only nested-loop is the sanctioned 1-row query-vector
    # broadcast of the ANN leg; no sort-merge join, final is top-k
    ret2 = qs["ret2_hybrid_rrf"](spark, sf)
    plan = ret2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan

    # er1: fuzzy blocking is an equi-join on the block key — never a
    # cartesian levenshtein sweep
    er1 = qs["er1_entity_clusters"](spark, sf)
    plan = er1._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, tmp_path):
    """Runtime (bloom) filter injection: a shuffle join whose build
    side carries a selective filter must plant a
    ``bloom_filter_might_contain`` probe on the fact side, so at
    100 TB the fact shuffle carries only rows whose key MIGHT match
    the filtered dim — rows that can't join are dropped at the scan,
    before the exchange, without any literal predicate on the fact."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_size")
    fact_path = str(tmp_path / "bloom_fact")
    dim_path = str(tmp_path / "bloom_dim")
    li.write.mode("overwrite").parquet(fact_path)
    part.write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("p_size") <= 5)

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        # force a shuffle join (broadcast would make the runtime
        # filter pointless) and drop the application-side size floor
        # (10 GiB by default — sized for real clusters, not testdata)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        joined = fact.join(
            dim, fact["l_partkey"] == dim["p_partkey"]
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # creation side: bloom built from the filtered dim keys;
        # probe side: might_contain() guard planted on the fact scan
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        got = joined.first()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    want = (
        li.join(part.filter(F.col("p_size") <= 5),
                li["l_partkey"] == part["p_partkey"])
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("l_quantity").cast("double").alias("qty"))
        .first()
    )
    assert got["n"] == want["n"] and got["n"] > 0
    assert got["qty"] == want["qty"]


def test_r5_session2_op_plans_stay_scale_shaped(spark):
    """Plan-shape regression guards for the r5 session-2 operators:
    shuffles stay bounded, small sides broadcast, nothing falls back
    to a sort-merge join of a corpus against a model artifact."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # tp14: map-only — zero exchanges of any kind
    tp14 = qs["tp14_domain_upsample"](spark, sf)
    plan = tp14._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan

    # sk8: the counter array broadcasts (nested-loop of ONE row is the
    # intended shape); the exact verify is the only hash shuffle
    sk8 = qs["sk8_heavy_hitters"](spark, sf)
    plan = sk8._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # 3 hash exchanges total: 2 inside the broadcast-built CMS
    # (key-reduce + coordinate-reduce, both over tiny relations) and
    # ONE for the exact verify groupBy — the corpus-sized relation
    # shuffles exactly once
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    # tok6: the per-word piece table joins the corpus word explode —
    # must never sort-merge (histogram side is Zipf-small, broadcast)
    tok6 = qs["tok6_bpe_char_encode"](spark, sf)
    plan = tok6._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    # gr5/gr1/gr3 resolve via the driver tier at fixture scale: the
    # output plan is a local-relation scan (optionally joined back) —
    # no iterative join chain survives into the final plan
    gr5 = qs["gr5_label_prop"](spark, sf)
    plan = gr5._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    gr1 = qs["gr1_pagerank"](spark, sf)
    plan = gr1._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # local ranks join node ids


def test_r6_op_plans_stay_scale_shaped(spark):
    """Plan-shape regression guards for the r6 operators: the batch
    ANN kernel shuffles once, retrieval/audit joins broadcast their
    tiny sides, and the graph/audit ops never sort-merge a corpus
    against a model artifact."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # ss15: one corpus scan; the only exchange is the |Q|*k-row
    # window hash partitioning — no join at all
    ss15 = qs["ss15_batch_topk"](spark, sf)
    plan = ss15._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

    # gr6: driver tier at fixture scale — the final plan is a local
    # relation scan, no peel-round join chain survives
    gr6 = qs["gr6_kcore"](spark, sf)
    plan = gr6._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan

    # ret3: both scoring passes join the broadcast term sets; the
    # feedback id-list and quota relations broadcast too — a
    # sort-merge join would mean a corpus-wide sort crept in
    ret3 = qs["ret3_rocchio_expand"](spark, sf)
    plan = ret3._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    # dd21: per-source sigs are one hash aggregate over doc sigs; the
    # pairwise estimate is a nested-loop of the tiny source relation
    # (intended), never a doc-pair join
    dd21 = qs["dd21_source_overlap"](spark, sf)
    plan = dd21._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    # dq4: two hash aggregates, no join anywhere
    dq4 = qs["dq4_fd_audit"](spark, sf)
    plan = dq4._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    # ts7: scalar watermark broadcasts into the map stage; the only
    # hash exchange is the per-type aggregate
    ts7 = qs["ts7_decayed_counts"](spark, sf)
    plan = ts7._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_r7_op_plans_stay_scale_shaped(spark):
    """Plan-shape regression guards for the r7 operators: tokenizer
    vocab artifacts ride as closures/local relations (never a
    corpus-side sort-merge), the SCC driver tier collapses to a
    local relation, tp15 is a TakeOrdered (never a global sort
    exchange), and dq6's only join is the token equi-join."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # tok9: word histogram + kernel rounds — no join in the final
    # vocab plan at all (it's a driver-assembled local relation)
    tok9 = qs["tok9_unigram_train"](spark, sf)
    plan = tok9._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan

    # tok10: the doc-words → distinct-word-encodings equi-join must
    # stay a hash join (a sort-merge here would sort the corpus
    # against the Zipf-small word relation)
    tok10 = qs["tok10_unigram_encode"](spark, sf)
    plan = tok10._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan

    # gr7: driver Tarjan tier at fixture scale — local relation (the
    # rotation-window side feeds the take, not the output plan)
    gr7 = qs["gr7_scc"](spark, sf)
    plan = gr7._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan

    # tp15: exactly one global TakeOrdered, never a Sort + single-
    # partition exchange (the k-rows-per-partition property is the
    # whole point of E-S sampling at scale)
    tp15 = qs["tp15_weighted_k_sample"](spark, sf)
    plan = tp15._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Join" not in plan

    # dq6: the token equi-join and the two tiny scalar cross-joins
    # (broadcast) — never a sort-merge, never a nested loop over the
    # token relation
    dq6 = qs["dq6_token_drift"](spark, sf)
    plan = dq6._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_r7_session2_op_plans_stay_scale_shaped(spark):
    """Plan-shape guards for the round-7 session-2 operators."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # dq7: the value equi-join stays a hash join (the distinct-value
    # relations are histogram-sized — a sort-merge would sort them
    # pointlessly); the scalar total rides a broadcast nested loop,
    # never a CartesianProduct
    dq7 = qs["dq7_ks_drift"](spark, sf)
    plan = dq7._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    # ss16: the moment trick means NO join of any kind in the plan —
    # one generate (explode) and two stacked hash aggregates
    ss16 = qs["ss16_embed_diversity"](spark, sf)
    plan = ss16._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Generate") >= 1

    # gr9: every join is a hash join on ids (the wedge self-join,
    # the anti-join, the degree joins — a sort-merge or cartesian
    # anywhere here breaks the Σdeg(mid)² bound), and the top-50 is
    # a TakeOrdered, never a global sort exchange
    gr9 = qs["gr9_link_predict"](spark, sf)
    plan = gr9._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_r7_session3_op_plans_stay_scale_shaped(spark):
    """Plan-shape guards for the round-7 session-3 operators."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # ts9: ONE hash exchange total (window + groupBy share the
    # user_id partitioning; the peak rides a map-side-combinable
    # struct max) and no join anywhere
    ts9 = qs["ts9_max_concurrency"](spark, sf)
    plan = ts9._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan

    # ret4: two DATA exchanges — the (token, doc) distinct and the
    # token window (the final group-by must reuse the window's token
    # partitioning) — plus the O(1)-row scalar count broadcast; the
    # doc-count join is a broadcast, never sort-merge
    ret4 = qs["ret4_postings_blocks"](spark, sf)
    plan = ret4._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange rangepartitioning" not in plan

    # ss17: row-local assignment vs inlined centroids — NO join of
    # any kind, ONE exchange (the k×d aggregation cells)
    ss17 = qs["ss17_kmeans_step"](spark, sf)
    plan = ss17._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1

    # ret6: conjunctive gram pruning + verify is ONE streaming scan
    # — no join, no exchange of any kind (the 14×-slower
    # per-position-lambda variant is what this guard prevents)
    ret6 = qs["ret6_trigram_search"](spark, sf)
    plan = ret6._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_dynamic_partition_pruning_prunes_fact_scan(spark, tmp_path):
    """At 100 TB the fact table is date-partitioned and the dim-side
    filter must reach the fact SCAN at runtime: Spark's dynamic
    partition pruning injects the broadcast dim keys as a partition
    filter (SubqueryAdaptiveBroadcast dynamicpruning in the plan) so
    only qualifying date directories are listed — the query-side
    complement of the zo2 storage-layout audit. Result equality vs
    the unpruned compute proves pruning is sound."""
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fact_dir = str(tmp_path / "fact")
    ev.select(
        "event_id", "user_id", "value", F.to_date("ts").alias("day")
    ).write.partitionBy("day").mode("overwrite").parquet(fact_dir)

    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    fact = spark.read.parquet(fact_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    n_days = daily.count()
    dim = daily.filter(F.col("n") > 35)  # busier-than-average days
    assert 0 < dim.count() < n_days  # a strict subset, so pruning bites
    j = fact.join(dim.hint("broadcast"), "day").groupBy("day").agg(
        F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("s")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()

    got = sorted((str(r["day"]), r["s"]) for r in j.collect())
    want = sorted(
        (str(r["day"]), r["s"])
        for r in ev.select(F.to_date("ts").alias("day"), "value")
        .join(dim.select("day"), "day")
        .groupBy("day")
        .agg(F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("s"))
        .collect()
    )
    assert got == want and len(got) > 0


def test_r7_session3b_op_plans_stay_scale_shaped(spark):
    """Plan guards for the later session-3 operators."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    # asof6: the big-big candidate join may sort-merge (both sides
    # are row-sized — correct strategy), but never a cartesian and
    # never a global sort exchange; exactly 2 hash exchanges (the
    # bucketed candidate key + the agg join-back)
    p = qs["asof6_window_agg"](spark, sf)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "Exchange rangepartitioning" not in p
    assert p.count("Exchange hashpartitioning") == 2

    # dq9: one co-partitioned exchange, header side joins broadcast
    p = qs["dq9_reconciliation"](spark, sf)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    # json2: one key-domain exchange, no join at all
    p = qs["json2_schema_profile"](spark, sf)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1

    # cdc2 / er2 / funnel2: hash/broadcast joins only
    for name in ("cdc2_snapshot_diff", "er2_blocking_recall",
                 "funnel2_time_bounded"):
        p = qs[name](spark, sf)._jdf.queryExecution()\
            .executedPlan().toString()
        assert "SortMergeJoin" not in p, name
        assert "CartesianProduct" not in p, name


def test_r8_op_plans_stay_scale_shaped(spark):
    """Plan-shape regression guards for the r8 operators (audited in
    PLANS.md §r8): the Heaps curve never joins doc-scale relations
    (its one BHJ is the ≤4-row histogram join), assortativity's two
    shuffle joins are the honest big⋈big edge→degree joins (no
    nested-loop, no cartesian), the IVF balance audit's nested loops
    are the intended broadcast centroid/total scalars, the schema
    drift runs join-free apart from broadcast scalar epilogues, and
    the wide simhash generator stays a single equi-join."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    ta15 = qs["ta15_heaps_curve"](spark, sf)
    plan = ta15._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # token-domain agg + two ≤4-row histogram aggs; the single BHJ
    # joins the two tiny histograms
    assert plan.count("BroadcastHashJoin") <= 1

    gr13 = qs["gr13_assortativity"](spark, sf)
    plan = gr13._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    ss20 = qs["ss20_ivf_balance"](spark, sf)
    plan = ss20._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # the BNLJs are the intended 8-row centroid broadcast and the
    # 1-row total broadcast (ss1's documented shape)

    dq10 = qs["dq10_schema_drift"](spark, sf)
    plan = dq10._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # bounds relation is lazily pinned: ≤4 events scans (bounds,
    # rows1, kv — plus at most one re-read), never 5+
    assert plan.count("FileScan") <= 4

    dd8b = qs["dd8b_simhash_wide"](spark, sf)
    plan = dd8b._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_r8_second_batch_plans_stay_scale_shaped(spark):
    """Plan guards for the second r8 batch: the coverage curve is one
    token shuffle + a level-histogram window (no joins at all), the
    gap histogram's only nested loop is the 1-row total broadcast,
    the FPR curve never cartesians (its SMJs are honest
    full-relation probe joins), and er4's sample is pinned (no
    repeated customer scans after materialization)."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    tok11 = qs["tok11_coverage_curve"](spark, sf)
    plan = tok11._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2

    ts10 = qs["ts10_gap_histogram"](spark, sf)
    plan = ts10._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    sk10 = qs["sk10_bloom_fpr_curve"](spark, sf)
    plan = sk10._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    er4 = qs["er4_deletion_blocking"](spark, sf)
    er4.collect()
    plan = er4._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0  # pinned sample, no re-scans


def test_r9_op_plans_stay_scale_shaped(spark):
    """Plan guards for the two r8 tail-of-session ops (r9 verdict
    item 1): seq4's path mining is window-only — NO joins, the final
    ordering is TakeOrderedAndProject over the |types|³ path domain,
    never a global sort exchange; gr14's wedge joins are shuffle-hash
    over the pinned edge relation (no SMJ sorting the Σdeg² term, no
    cartesian, zero FileScan re-derivations of the LSH banding)."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    seq4 = qs["seq4_session_paths"](spark, sf)
    seq4.collect()
    plan = seq4._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan

    gr14 = qs["gr14_two_hop_reach"](spark, sf)
    gr14.collect()
    plan = gr14._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FileScan") == 0  # pinned edge relation

    # tok12: one token shuffle + stacked level histograms; the only
    # nested-loop joins are the two 1-row broadcasts (bounds, oov)
    tok12 = qs["tok12_vocab_drift"](spark, sf)
    tok12.collect()
    plan = tok12._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2

    # tp17: join-free — one documents pass, all three max_len cells
    # in ONE 1-row aggregate
    tp17 = qs["tp17_truncation_loss"](spark, sf)
    tp17.collect()
    plan = tp17._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 0

    # dq12: one per-user window (never a global row sort) + 1-row agg
    dq12 = qs["dq12_event_order_audit"](spark, sf)
    dq12.collect()
    plan = dq12._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan

    # gr15: pinned edge relation (no LSH re-derivation), degree
    # groupBy, ≤64-row bucket epilogue
    gr15 = qs["gr15_wedge_skew_audit"](spark, sf)
    gr15.collect()
    plan = gr15._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan") == 0

    # ret8: capped query sample, rarest-term inverted probe; the only
    # nested loop is the 1-row stats broadcast (AQE prints the final
    # and initial plans, so it appears ≤2 times)
    ret8 = qs["ret8_self_retrieval_mrr"](spark, sf)
    ret8.collect()
    plan = ret8._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2

    # sk11: key domain pinned once; per-width passes never rescan
    # the raw stream (0 FileScans after materialization), counter
    # joins broadcast
    sk11 = qs["sk11_cms_width_curve"](spark, sf)
    sk11.collect()
    plan = sk11._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan") == 0

    # ss21: one posexplode → one 64-group groupBy; join-free
    ss21 = qs["ss21_dim_stats"](spark, sf)
    ss21.collect()
    plan = ss21._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    # dq13: ONE scan — the multi-distinct agg compiles to Expand,
    # not to per-column scans
    dq13 = qs["dq13_column_profile"](spark, sf)
    dq13.collect()
    plan = dq13._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("FileScan") <= 2  # AQE prints final+initial


def test_corpus_curation_run_report_plan_is_scan_free(spark):
    """r10 capstone plan guard: the curation-run report derives
    entirely from the two pinned relations (the per-doc artifact scan
    and the verdict relation) — ZERO FileScans in the report plan, so
    no tier re-derives the documents parquet; and the only corpus
    self-join in the whole run is the banded LSH candidate join
    (guarded upstream), so the report itself has no cartesian / no
    SMJ over doc-scale rows."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    df = registry.spark_queries()["corpus_curation_run"](spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0  # pinned base + verdict
    assert "CartesianProduct" not in plan


def test_r10_wave3_plans_stay_scale_shaped(spark):
    """Plan guards for the r10 third-wave design artifacts: ta17 and
    ss22 are single-pass (join-free up to their histogram windows);
    ts14's spine fill never degenerates to a cartesian product; gr17
    runs entirely off the pinned edge checkpoint (0 FileScans — the
    LSH banding is never re-derived by the triangle or degree
    passes); dd28's broadcast signature lookups stay hash joins."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    ta17 = qs["ta17_filter_attribution"](spark, sf)
    ta17.collect()
    plan = ta17._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan

    ss22 = qs["ss22_norm_profile"](spark, sf)
    ss22.collect()
    plan = ss22._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    ts14 = qs["ts14_changepoint_profile"](spark, sf)
    ts14.collect()
    plan = ts14._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    gr17 = qs["gr17_transitivity"](spark, sf)
    gr17.collect()
    plan = gr17._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("FileScan") == 0  # pinned edge relation only

    dd28 = qs["dd28_sig_length_curve"](spark, sf)
    dd28.collect()
    plan = dd28._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r10_wave4_plans_stay_scale_shaped(spark):
    """sk13 builds the counter matrix once and probes it via a
    broadcast hash join (no cartesian); geo3 is join-free (cell keys
    are column expressions); er6's blocked self-join is an equi-join
    on the block key, never a cartesian product."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    sk13 = qs["sk13_cms_depth_curve"](spark, sf)
    sk13.collect()
    plan = sk13._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    geo3 = qs["geo3_grid_density_profile"](spark, sf)
    geo3.collect()
    plan = geo3._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    er6 = qs["er6_distance_threshold_curve"](spark, sf)
    er6.collect()
    plan = er6._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ol4_plan_stays_scale_shaped(spark):
    """ol4's three stats relations live on the group domain and come
    back as broadcasts; the verdict is one conditional pass — no
    cartesian, no nested-loop join anywhere."""
    from enriched_crime_incident_data_pipeline_spark import registry

    ol4 = registry.spark_queries()["ol4_gate_agreement"](
        spark, "/root/testdata/sf0.001"
    )
    ol4.collect()
    plan = ol4._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r10_wave6_plans_stay_scale_shaped(spark):
    """sj3 is join-free (one key groupBy, conditional cells, stack);
    tp20's only join is the primary-key join-back of the prefix-sum
    relation — never a cartesian."""
    from enriched_crime_incident_data_pipeline_spark import registry

    sf = "/root/testdata/sf0.001"
    qs = registry.spark_queries()

    sj3 = qs["sj3_salt_factor_curve"](spark, sf)
    sj3.collect()
    plan = sj3._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    tp20 = qs["tp20_fragmentation_by_source"](spark, sf)
    tp20.collect()
    plan = tp20._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_mm10_plan_stays_scale_shaped(spark):
    """mm10 is one Arrow signature pass + bounded-domain groupBys —
    no pair join at all (it PRICES mm5's join without running it)."""
    from enriched_crime_incident_data_pipeline_spark import registry

    mm10 = registry.spark_queries()["mm10_dhash_band_skew"](
        spark, "/root/testdata/sf0.001"
    )
    mm10.collect()
    plan = mm10._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dc11_plan_stays_scale_shaped(spark):
    """dc11 composes two doc-domain flag relations (broadcast
    eval-gram set; broadcast packed bitset) and joins them on the
    primary key — no cartesian, no corpus self-join."""
    from enriched_crime_incident_data_pipeline_spark import registry

    dc11 = registry.spark_queries()["dc11_bloom_exact_agreement"](
        spark, "/root/testdata/sf0.001"
    )
    dc11.collect()
    plan = dc11._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
