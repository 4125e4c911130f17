"""Pins for grid proximity join and fuzzy name matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
    fuzzy_name_pairs,
    grid_proximity_join,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "pid int, x int, y int")


def test_grid_join_finds_exactly_the_close_pairs(spark):
    pts = _points(
        spark,
        [
            (1, 0, 0),
            (2, 1, 1),    # within r=1 of 1 and 3
            (3, 2, 2),    # within r=1 of 2, not of 1
            (4, 10, 10),  # isolated
        ],
    )
    pairs = sorted(
        (r["id_a"], r["id_b"])
        for r in grid_proximity_join(pts, "pid", "x", "y", radius=1).collect()
    )
    assert pairs == [(1, 2), (2, 3)]


def test_grid_join_each_pair_reported_once(spark):
    # points in the same cell AND adjacent cells must not duplicate
    pts = _points(spark, [(1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 1, 1)])
    out = grid_proximity_join(pts, "pid", "x", "y", radius=2).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs)) == 6  # all C(4,2) pairs, once


def test_grid_join_plan_is_equi_join(spark):
    pts = _points(spark, [(i, i % 5, i % 7) for i in range(50)])
    plan = (
        grid_proximity_join(pts, "pid", "x", "y", radius=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_pairs_blocked_levenshtein(spark):
    names = spark.createDataFrame(
        [
            (1, "MAIN ST BLK 12"),
            (2, "MAIN ST BLK 13"),   # lev 1 in the last char: same block
            (3, "MAIN ST BLK 1"),    # shorter → different block
            (4, "OAK AVE"),
        ],
        "id int, name string",
    )
    out = fuzzy_name_pairs(names, "id", "name", max_distance=1).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in out] == [(1, 2, 1)]


def test_fuzzy_blocking_excludes_cross_block_pairs(spark):
    # lev("AB","AC")=1 but different (prefix, length) blocks when the
    # difference is not in the last char: "XAB" vs "YAB"
    names = spark.createDataFrame(
        [(1, "XAB"), (2, "YAB")], "id int, name string"
    )
    assert fuzzy_name_pairs(names, "id", "name").count() == 0


def test_grid_knn_exact_and_plan(spark):
    """geo2: nearest-within-radius equals the brute-force answer and
    the plan is a hash join on the cell key (no cartesian/BNLJ)."""
    from enriched_crime_incident_data_pipeline_spark.operators.spatial import (
        grid_nearest_neighbor,
    )

    pts = [(i, (i * 7) % 23, (i * 11) % 19) for i in range(120)]
    df = spark.createDataFrame(pts, "pid long, px int, py int")
    out = grid_nearest_neighbor(df, "pid", "px", "py", radius=2)
    got = {(r["pid"], r["nn_id"], r["d2"]) for r in out.collect()}

    want = {}
    for i, xa, ya in pts:
        best = None
        for j, xb, yb in pts:
            if i == j or abs(xa - xb) > 2 or abs(ya - yb) > 2:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if best is None or (d2, j) < best:
                best = (d2, j)
        if best is not None:
            want[i] = (best[1], best[0])
    assert got == {(i, nn, d2) for i, (nn, d2) in want.items()}

    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_er2_blocking_recall_semantics(spark):
    """Blocked ⊆ truth (recall ≤ 10000 always); on real data the
    prefix scheme's known weakness (pairs differing in a non-final
    character) shows as recall < 10000; on a fixture where every
    dup differs ONLY in the last character, recall is exactly
    10000."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    (real,) = spark_queries()["er2_blocking_recall"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert real["blocked_pairs"] <= real["true_pairs"]
    assert real["recall_bp"] <= 10000

    rows = [
        (7, "Customer#00a"), (14, "Customer#00b"),   # last-char dup
        (21, "Customer#00c"), (28, "Customer#00d"),  # last-char dup
        (35, "Wholly Different Name"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "c_custkey bigint, c_name string"
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    (fx,) = spark_queries()["er2_blocking_recall"](spark, d).collect()
    # all 6 pairs among the 4 Customer#00x names are distance-1 truth
    assert fx["true_pairs"] == 6 == fx["blocked_pairs"]
    assert fx["recall_bp"] == 10000


def test_er3_cohesion_detects_chaining(spark):
    """Cohesion semantics on a constructed chain under the audit's
    2-char-tail/distance-1 configuration: "name12"~"name13" and
    "name13"~"name23" are direct (distance 1) but "name12"!~
    "name23" (distance 2) — one 3-member cluster, 3 intra pairs, 2
    direct -> 6666 bp. A clean distance-1 pair alone scores 10000.
    (With er1's 1-char-tail blocking this audit would be
    structurally 10000 — clusters are cliques; that proof lives in
    fuzzy_name_pairs' docstring and is why the audit widens the
    block.)"""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    def run(names):
        rows = [(i + 1, n) for i, n in enumerate(names)]
        d = tempfile.mkdtemp()
        spark.createDataFrame(
            rows, "c_custkey bigint, c_name string"
        ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        (r,) = spark_queries()["er3_cluster_cohesion"](spark, d).collect()
        return (r["intra_pairs"], r["direct_pairs"], r["cohesion_bp"])

    assert run(["name12", "name13", "name23", "unrelated thing"]) == (
        3, 2, 2 * 10000 // 3,
    )
    assert run(["name12", "name13", "other junk here"]) == (1, 1, 10000)


def test_er4_deletion_blocking_catches_midsuffix_edit(spark):
    """Hand fixture for the er4 story: a substitution at the
    third-from-last char is INVISIBLE to prefix blocking (the pair
    lands in different prefix blocks) but shared-deletion-variant
    blocking catches it; recall columns pin 0 bp vs 10000 bp."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    rows = [
        (7, "Customer#000000107"),
        (14, "Customer#000000207"),  # differs at position -3: dist 1
        (21, "Customer#000999999"),  # unrelated
    ]
    cust = spark.createDataFrame(rows, "c_custkey bigint, c_name string")
    d = tempfile.mkdtemp()
    cust.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    (r,) = spark_queries()["er4_deletion_blocking"](spark, d).collect()
    assert (
        r["n_sampled"],
        r["true_pairs"],
        r["prefix_pairs"],
        r["deletion_pairs"],
    ) == (3, 1, 0, 1)
    assert r["recall_prefix_bp"] == 0
    assert r["recall_deletion_bp"] == 10000
