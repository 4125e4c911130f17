"""Z-order clustering layout and weighted-sampling pins."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
    weighted_sample,
)
from enriched_crime_incident_data_pipeline_spark.sinks.zorder import (
    morton_code,
    write_zordered,
)


def test_morton_code_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], "a int, b int"
    )
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_code(F.col("a"), F.col("b"), 4).alias("z")
        ).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 0)] == 4
    assert out[(3, 3)] == 15


def test_zordered_files_bound_tiles_in_both_dims(spark, tmp_path):
    # 64x64 grid → 16 z-range files must each cover a small rectangle
    # in BOTH dimensions (a 1-D sort would leave one dim full-range)
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("int").alias("x"),
        (F.col("id") / n).cast("int").alias("y"),
    )
    path = str(tmp_path / "zorder")
    write_zordered(grid, path, "x", "y", bits=6, num_files=16)

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) >= 8
    total_area = 0
    for f in files:
        stats = (
            spark.read.parquet(f)
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .collect()[0]
        )
        total_area += (stats["dx"] + 1) * (stats["dy"] + 1)
    # perfect 16-tile z-layout → every file a 16x16 tile; allow 3x
    # slack for range-boundary sampling, still far under the 1-D
    # sort's worst case (each file spanning the full 64 in one dim)
    assert total_area / len(files) <= 3 * 16 * 16


def test_weighted_sample_rate_tracks_weight(spark):
    rows = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 9000).otherwise(1000).alias("w"),
    )
    kept = weighted_sample(rows, F.col("w"))
    high = kept.filter(F.col("w") == 9000).count()
    low = kept.filter(F.col("w") == 1000).count()
    assert abs(high / 10000 - 0.9) < 0.03
    assert abs(low / 10000 - 0.1) < 0.03


def test_weighted_sample_is_reproducible_and_monotone(spark):
    rows = spark.range(1000).select(F.col("id").alias("doc_id"))
    w50 = set(
        r["doc_id"]
        for r in weighted_sample(
            rows.withColumn("w", F.lit(5000)), F.col("w")
        ).collect()
    )
    w50_again = set(
        r["doc_id"]
        for r in weighted_sample(
            rows.withColumn("w", F.lit(5000)), F.col("w")
        ).collect()
    )
    w80 = set(
        r["doc_id"]
        for r in weighted_sample(
            rows.withColumn("w", F.lit(8000)), F.col("w")
        ).collect()
    )
    assert w50 == w50_again
    # raising every weight only ADDS rows (hash threshold is monotone)
    assert w50 <= w80


def test_weighted_sample_k_matches_python_model(spark):
    # exact-set equality vs the pure-Python Efraimidis-Spirakis model
    # (same md5 uniforms, same sqrt-tier keys, same tie-break)
    import hashlib

    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        weighted_sample_k,
    )

    rows = [(i, i % 7) for i in range(200)]  # tiers 0..6 → clamped 0..4
    df = spark.createDataFrame(rows, "doc_id long, t long")
    got = [
        (r["doc_id"], r["tier"], r["es_key"])
        for r in weighted_sample_k(df, 25, F.col("t"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .collect()
    ]

    def model_key(i, t):
        h = int(hashlib.md5(f"es:{i}".encode()).hexdigest()[:8], 16)
        u = float(h + 1) / 4294967296.0
        for _ in range(min(max(t, 0), 4)):
            u = u**0.5  # Python **0.5 is correctly-rounded sqrt
        return u

    exp = sorted(
        ((i, min(max(t, 0), 4), model_key(i, t)) for i, t in rows),
        key=lambda x: (-x[2], x[0]),
    )[:25]
    assert got == exp


def test_es_sqrt_tier_keys_obey_the_multiplicity_law():
    # the SCHEME pin (independent of Spark): with true uniforms, the
    # probability that item i has the LARGEST key u^(1/2^t) is
    # w_i/Σw for one draw (Efraimidis-Spirakis theorem 1) — Monte
    # Carlo over 40k trials, tiers (0,1,2,3) → weights (1,2,4,8),
    # expected shares (1,2,4,8)/15, tolerance ±0.015
    import random

    rng = random.Random(20260815)
    tiers = [0, 1, 2, 3]
    wins = [0, 0, 0, 0]
    n = 40_000
    for _ in range(n):
        best, arg = -1.0, -1
        for j, t in enumerate(tiers):
            key = rng.random()
            for _ in range(t):
                key = key**0.5
            if key > best:
                best, arg = key, j
        wins[arg] += 1
    tot = 1 + 2 + 4 + 8
    for j, w in enumerate([1, 2, 4, 8]):
        assert abs(wins[j] / n - w / tot) < 0.015, (j, wins[j] / n, w / tot)


def test_weighted_sample_k_returns_all_when_k_exceeds_n(spark):
    from pyspark.sql import functions as F

    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        weighted_sample_k,
    )

    df = spark.createDataFrame([(1, 0), (2, 3)], "doc_id long, t long")
    assert weighted_sample_k(df, 10, F.col("t")).count() == 2


def test_zo2_skipping_audit_zorder_dominates(spark):
    """The audit's point, asserted: on every predicate the z-ordered
    layout scans strictly fewer rows than the insertion layout, and
    scanning is sound (rows_scanned >= rows_matching — a pruned tile
    never hides a match)."""
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    rows = spark_queries()["zo2_skipping_audit"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by = {(r["layout"], r["predicate"]): r for r in rows}
    assert len(by) == 4
    for pred in ("px_10_19", "py_40_49"):
        z, i = by[("zorder", pred)], by[("insertion", pred)]
        assert z["rows_matching"] == i["rows_matching"]
        assert z["rows_scanned"] >= z["rows_matching"]
        assert i["rows_scanned"] >= i["rows_matching"]
        assert z["rows_scanned"] < i["rows_scanned"]
        assert z["tiles_scanned"] < z["n_tiles"]
