"""Pins for the deterministic Bloom and count-min sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
    bloom_build,
    bloom_probe,
    cms_counters,
    cms_estimates,
)


def test_bloom_has_no_false_negatives(spark):
    build = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(100)], "id long, key string"
    )
    bits = bloom_build(build, F.col("key"))
    out = bloom_probe(build, bits, F.col("key"), "id").collect()
    assert all(r["hit"] == 1 for r in out)


def test_bloom_rejects_most_non_members(spark):
    build = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(100)], "id long, key string"
    )
    probes = spark.createDataFrame(
        [(i, f"stranger-{i}") for i in range(200)], "id long, key string"
    )
    bits = bloom_build(build, F.col("key"))
    hits = sum(
        r["hit"] for r in bloom_probe(probes, bits, F.col("key"), "id").collect()
    )
    # 100 keys × 3 bits in 65536 → FP probability ≈ 9.6e-8 per probe
    assert hits == 0


def test_bloom_probe_is_deterministic(spark):
    build = spark.createDataFrame([(1, "a")], "id long, key string")
    probes = spark.createDataFrame(
        [(i, f"p{i}") for i in range(50)], "id long, key string"
    )
    bits = bloom_build(build, F.col("key"))
    a = sorted(
        (r["id"], r["hit"])
        for r in bloom_probe(probes, bits, F.col("key"), "id").collect()
    )
    b = sorted(
        (r["id"], r["hit"])
        for r in bloom_probe(probes, bits, F.col("key"), "id").collect()
    )
    assert a == b


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    rows = [(i % 10,) for i in range(1000)]  # keys 0..9, 100 each
    df = spark.createDataFrame(rows, "k int").select(
        F.col("k"), F.col("k").cast("string").alias("key")
    )
    counters = cms_counters(df, F.col("key"))
    keys = df.groupBy("k", "key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = {
        r["k"]: r["est"]
        for r in cms_estimates(keys, counters, F.col("key"), "k").collect()
    }
    true = {r["k"]: r["true_cnt"] for r in keys.collect()}
    for k, t in true.items():
        assert est[k] >= t
    # 10 keys in 4×1024 counters: collisions essentially impossible
    assert est == true


def test_cms_counter_matrix_is_bounded(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(5000)], "k int"
    ).select(F.col("k").cast("string").alias("key"))
    counters = cms_counters(df, F.col("key"))
    assert counters.count() <= 4 * 1024
    # total mass per sketch row equals the stream size
    per_row = counters.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == 5000 for r in per_row)


def test_bloom_no_false_negatives_property(spark):
    """Randomized no-false-negative sweep: several disjoint build
    sets, every member must probe as hit."""
    from pyspark.sql import functions as F

    for seed in (3, 17, 91):
        build = spark.createDataFrame(
            [(i, f"s{seed}-key-{i * seed % 977}") for i in range(80)],
            "id long, key string",
        ).dropDuplicates(["key"])
        bits = bloom_build(build, F.col("key"))
        out = bloom_probe(build, bits, F.col("key"), "id").collect()
        assert all(r["hit"] == 1 for r in out), f"false negative at seed {seed}"


def test_cms_overestimate_property(spark):
    """est ≥ true for every key, on a skewed random-ish stream."""
    from pyspark.sql import functions as F

    rows = [((i * i + 7 * i) % 37,) for i in range(3000)]
    df = spark.createDataFrame(rows, "k int").select(
        F.col("k"), F.col("k").cast("string").alias("key")
    )
    counters = cms_counters(df, F.col("key"))
    keys = df.groupBy("k", "key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = {
        r["k"]: r["est"]
        for r in cms_estimates(keys, counters, F.col("key"), "k").collect()
    }
    for r in keys.collect():
        assert est[r["k"]] >= r["true_cnt"]


def test_hll_estimate_accuracy_and_mergeability(spark):
    """sk4: raw HLL within a few standard errors of the true distinct
    count, and the register state is mergeable — registers of the
    union == elementwise max of per-part registers (the property that
    lets executors keep 1 KiB of state each)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_distinct_estimate,
        hll_registers,
    )

    df = spark.range(20000).select(
        F.concat(F.lit("v"), F.col("id")).alias("x")
    )
    est = hll_distinct_estimate(df, F.col("x")).first()
    assert est["m"] == 1024
    # standard error 1.04/sqrt(1024) = 3.25%; allow 4 sigma
    assert abs(est["raw_estimate"] - 20000) < 20000 * 0.13

    half_a = df.filter(F.col("x") < "v1")  # lexical split
    half_b = df.filter(F.col("x") >= "v1")
    merged = (
        hll_registers(half_a, F.col("x"))
        .unionAll(hll_registers(half_b, F.col("x")))
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(df, F.col("x"))
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in whole.collect()
    }

    # partitioning invariance: same bits under any layout
    re_est = hll_distinct_estimate(df.repartition(13), F.col("x")).first()
    assert re_est["raw_estimate"] == est["raw_estimate"]


def test_hll_grouped_rollup_merge_equals_direct(spark):
    """sk5: merging leaf-group register tables up a hierarchy (max per
    register) yields EXACTLY the sketch computed directly from the
    coarser group's raw rows — so a rollup never rescans fact data."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_estimates_from_registers,
        hll_grouped_registers,
        hll_merge_registers,
    )

    df = spark.range(40000).select(
        (F.col("id") % 4).alias("leaf"),
        (F.col("id") % 2).alias("parent"),
        F.concat(F.lit("v"), F.col("id")).alias("x"),
    )
    leaf_regs = hll_grouped_registers(df, ["leaf", "parent"], F.col("x"))
    merged_parent = hll_merge_registers(leaf_regs, ["parent"])
    direct_parent = hll_grouped_registers(df, ["parent"], F.col("x"))
    assert (
        merged_parent.exceptAll(direct_parent).count() == 0
        and direct_parent.exceptAll(merged_parent).count() == 0
    )
    est = {
        r["parent"]: r["raw_estimate"]
        for r in hll_estimates_from_registers(
            merged_parent, ["parent"]
        ).collect()
    }
    # each parent sees 20000 distinct values (x = v<id>, ids split 2-way)
    for p in (0, 1):
        assert abs(est[p] - 20000) < 20000 * 0.13


def test_heavy_hitters_exact_even_with_colliding_sketch(spark):
    """sk8's exactness claim: the CMS pass only SHORTLISTS — with a
    deliberately tiny sketch (w=8, d=1, collisions guaranteed) the
    verify pass must still return exactly GROUP BY HAVING, because
    overestimates can only add false candidates, never drop true
    ones."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        heavy_hitters_exact,
    )
    from pyspark.sql import functions as F

    rows = (
        [("hot",)] * 50
        + [("warm",)] * 10
        + [(f"cold{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k string")
    for d, w in [(1, 8), (2, 16), (4, 1024)]:
        got = {
            (r["key"], r["n"])
            for r in heavy_hitters_exact(
                df, F.col("k"), threshold=10, d=d, w=w
            ).collect()
        }
        assert got == {("hot", 50), ("warm", 10)}, (d, w, got)


def test_group_heavy_hitters_exact_with_tiny_colliding_sketch(spark):
    """The domination argument under maximal collision pressure: a
    deliberately tiny CMS (d=2, w=4 — everything collides) must
    still produce the EXACT per-group answer, including a key that
    is globally heavy but below threshold in every single group
    (the global shortlist admits it, the per-group verify drops
    it)."""
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        group_heavy_hitters_exact,
    )

    rows = []
    # key "a": 6 in g1, 1 in g2; key "b": 4+4 (globally 8, never >=6
    # in one group); key "c": 2 total
    rows += [("g1", "a")] * 6 + [("g2", "a")] * 1
    rows += [("g1", "b")] * 4 + [("g2", "b")] * 4
    rows += [("g1", "c")] * 2
    df = spark.createDataFrame(rows, "g string, k string")
    got = {
        (r["grp"], r["key"]): r["n"]
        for r in group_heavy_hitters_exact(
            df, F.col("g"), F.col("k"), threshold=6, d=2, w=4
        ).collect()
    }
    assert got == {("g1", "a"): 6}
