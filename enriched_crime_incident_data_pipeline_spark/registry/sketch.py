"""Sketch family (sk*): KMV, Bloom, CMS, HLL, quantile sketches, exact heavy hitters.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import bloom_build, bloom_probe, cms_counters, cms_entries, cms_estimates
from enriched_crime_incident_data_pipeline_spark.functions.text import doc_fingerprint
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _BLOOM_POS,
    _CMS_POS,
    _HASH32,
    _NORM,
)




def q_sk4_hll_distinct(spark, sf_dir):
    # deterministic HyperLogLog: 1024 registers over a 52-bit
    # md5-derived hash, rho via integer bit-length (no log2), raw
    # estimator only (range corrections need ln, a transcendental
    # that breaks cross-engine bit-parity). The register table is the
    # mergeable 1 KiB sketch state.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_distinct_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return hll_distinct_estimate(li, F.col("l_partkey").cast("string"))


_SK12_PRECISIONS = [
    # (p, m, alpha, divisor=2^(52-p), wbits=52-p). Alphas follow the
    # HLL paper: 0.709 for m=64, 0.7213/(1+1.079/m) for m>=128 —
    # computed HERE with the same op sequence the oracle SQL spells
    # out (m is a power of two, so every scaling step is
    # exponent-only and the doubles agree bit-for-bit).
    (6, 64, 0.709, 1 << 46, 46),
    (8, 256, 0.7213 / (1.0 + 1.079 / 256), 1 << 44, 44),
    (10, 1024, 0.7213 / (1.0 + 1.079 / 1024), 1 << 42, 42),
]


def q_sk12_hll_precision_curve(spark, sf_dir):
    # the HLL REGISTER-COUNT sizing artifact (r10; sk11 is the CMS
    # analogue): raw estimate + error vs the exact distinct at
    # m = 64 / 256 / 1024 registers, over l_partkey. ONE fact pass:
    # the shared 52-bit hash is computed once, a 3-struct explode
    # assigns each precision its (register, rho) split, and one
    # map-side-combinable groupBy over the ≤(64+256+1024)-cell
    # (m, register) domain holds ALL three sketches — shuffle volume
    # is |registers|, never rows. The exact baseline is one
    # count_distinct branch over the pruned key column (the one
    # honest extra scan, stated; the whole point of HLL is that at
    # 100 TB you keep the sketch and DROP that branch — here it is
    # the curve's truth column). rho via integer bit-length (sk4's
    # transcendental-free discipline).
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(F.col("l_partkey").cast("string").alias("k"))
    h = F.conv(F.substring(F.md5(F.col("k")), 1, 13), 16, 10).cast("long")
    pr = keyed.select(
        h.alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.lit(float(alpha)).alias("alpha"),
                        F.lit(div).alias("divisor"),
                        F.lit(wb).alias("wbits"),
                    )
                    for (_p, m, alpha, div, wb) in _SK12_PRECISIONS
                ]
            )
        ).alias("c"),
    ).select(
        F.col("c.m").alias("m"),
        F.col("c.alpha").alias("alpha"),
        F.col("c.wbits").alias("wbits"),
        F.expr("h DIV c.divisor").alias("register"),
        (F.col("h") % F.col("c.divisor")).alias("w"),
    )
    regs = pr.select(
        "m",
        "alpha",
        "register",
        F.when(F.col("w") == 0, F.col("wbits") + 1)
        .otherwise(F.col("wbits") + 1 - F.length(F.bin(F.col("w"))))
        .alias("rho"),
    ).groupBy("m", "alpha", "register").agg(F.max("rho").alias("rho"))
    est = regs.groupBy("m", "alpha").agg(
        F.count(F.lit(1)).cast("int").alias("observed"),
        (
            F.col("alpha") * F.col("m") * F.col("m")
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.col("m") - F.count(F.lit(1))).cast("double")
            )
        ).alias("raw_estimate"),
    )
    exact = keyed.agg(
        F.count_distinct("k").cast("bigint").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("m").cast("int").alias("m"),
        "observed",
        "raw_estimate",
        "exact_distinct",
        (
            (F.col("raw_estimate") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
            * F.lit(10000.0)
        ).alias("err_bp"),
    )


def q_sk5_hll_rollup(spark, sf_dir):
    # mergeable-sketch rollup: distinct active customers per nation /
    # region / global as HLL register tables. The leaf (nation) level
    # is the ONLY pass over the fact data; region and global sketches
    # are derived by MERGING register tables (max per register) — the
    # associativity the oracle verifies by computing each level
    # directly from the raw rows. This is the 100 TB count-distinct
    # rollup shape: 1 KiB of state per group, no re-scan per level.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        hll_estimates_from_registers,
        hll_grouped_registers,
        hll_merge_registers,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rel = (
        orders.select("o_custkey")
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name", "r_name", F.col("o_custkey").cast("string").alias("cust"))
    )
    nat_regs = hll_grouped_registers(rel, ["n_name", "r_name"], F.col("cust"))
    reg_regs = hll_merge_registers(nat_regs, ["r_name"])
    glob_regs = hll_merge_registers(reg_regs, [])
    est = lambda regs, cols, level, key: (  # noqa: E731
        hll_estimates_from_registers(regs, cols).select(
            F.lit(level).alias("level"),
            key.alias("key"),
            "m",
            "observed",
            "raw_estimate",
        )
    )
    return (
        est(nat_regs, ["n_name", "r_name"], "nation", F.col("n_name"))
        .unionByName(est(reg_regs, ["r_name"], "region", F.col("r_name")))
        .unionByName(est(glob_regs, [], "global", F.lit("ALL")))
    )


def q_sk6_kmv_set_ops(spark, sf_dir):
    # sketch set algebra: union/intersection/Jaccard of the part sets
    # shipped before vs from 1997, from two 256-hash KMV sketches —
    # no re-scan, no join of the underlying sets; the k-min merge is
    # TakeOrdered, estimator arithmetic integer-exact + one divide
    # chain (bit-reproducible)
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        kmv_set_estimates,
    )

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_shipdate") < "1997-01-01")
    b = li.filter(F.col("l_shipdate") >= "1997-01-01")
    return kmv_set_estimates(
        a,
        b,
        F.col("l_partkey").cast("string"),
        F.col("l_partkey").cast("string"),
    )


def q_sk7_quantile_sketch(spark, sf_dir):
    # mergeable histogram quantile sketch: p50/p95/p99 of
    # l_extendedprice from a fixed-width bucket→count table. One
    # groupBy pass over the fact data (map-side combine bounds the
    # shuffle at ~#buckets rows per partition); the read-out window
    # runs over the tiny bucket relation only. |est − true| < width
    # by construction (pinned in test_graph_sketch.py).
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        histogram_quantile_sketch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantile_sketch(
        li, F.col("l_extendedprice"), 1000.0,
        qs=((1, 2), (19, 20), (99, 100)),
    )


def q_sk1_kmv_distinct(spark, sf_dir):
    # deterministic KMV distinct sketch: k smallest md5 hashes →
    # estimate, reproducible bit-for-bit in any engine with md5
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        kmv_distinct_estimate,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct_estimate(li, F.col("l_partkey").cast("string"))



def q_sk9_group_heavy_hitters(spark, sf_dir):
    # per-GROUP exact frequent items ("heavy users per event type")
    # from ONE global sketch: the global CMS estimate dominates
    # every per-group count, so the shared shortlist is complete for
    # all groups simultaneously — no |groups| x sketch state, no
    # second sketch pass; the exact (group, key) groupBy + HAVING
    # kills collisions. See datapipe/sketch.py
    # group_heavy_hitters_exact for the domination argument.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        group_heavy_hitters_exact,
    )

    ev = load_table(spark, sf_dir, "events")
    return group_heavy_hitters_exact(
        ev,
        F.col("event_type"),
        F.col("user_id").cast("string"),
        threshold=12,
    )


def q_sk8_heavy_hitters(spark, sf_dir):
    # exact frequent items, sketch-then-verify: CMS counters (one
    # mergeable agg) ride the row filter as a literal array —
    # array_min over d coordinates per row, no join, no distinct
    # pass; only sketch survivors reach the exact groupBy + HAVING
    # (CMS never underestimates ⇒ no false negatives, collisions die
    # in the verify). Output == plain GROUP BY HAVING, by
    # construction, at any sketch size.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        heavy_hitters_exact,
    )

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact(
        ev, F.col("user_id").cast("string"), threshold=80
    )


def q_sk11_cms_width_curve(spark, sf_dir):
    # the count-min SIZING artifact (sk10's bloom curve for the other
    # sketch the engine ships): measured overestimate at widths
    # w = 2⁸/2¹⁰/2¹² counters per row, d=4 rows, over the lineitem
    # partkey stream sk3 sketches. The key domain reduces ONCE to a
    # pinned (key, true_cnt) relation; per width the d-coordinate
    # explode, the ≤d·w counter matrix, the broadcast-back min
    # estimate and the error cells all run over that pinned relation
    # — the raw stream is scanned exactly once whatever the curve
    # length. CMS never underestimates, so total_overest ≥ 0 by
    # construction and exact_keys counts collision-free keys;
    # overest_share_bp = Σ(est−true)·10⁴ DIV Σtrue is the number the
    # width budget is chosen from.
    li = load_table(spark, sf_dir, "lineitem")
    keyed = (
        li.select(F.col("l_partkey").cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .localCheckpoint(eager=False)
    )
    outs = []
    for w in (1 << 8, 1 << 10, 1 << 12):
        pos = keyed.select(
            F.explode(cms_entries(F.col("key"), w=w)).alias("e"), "true_cnt"
        ).select("e.j", "e.bucket", "true_cnt")
        counters = pos.groupBy("j", "bucket").agg(
            F.sum("true_cnt").alias("cnt")
        )
        est = (
            keyed.select(
                "key", F.explode(cms_entries(F.col("key"), w=w)).alias("e")
            )
            .select("key", "e.j", "e.bucket")
            .join(F.broadcast(counters), ["j", "bucket"])
            .groupBy("key")
            .agg(F.min("cnt").cast("bigint").alias("est"))
        )
        j = keyed.join(est, "key")
        outs.append(
            j.agg(
                F.lit(w).cast("int").alias("w_buckets"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum("true_cnt").cast("bigint").alias("total_true"),
                F.sum(F.col("est") - F.col("true_cnt"))
                .cast("bigint")
                .alias("total_overest"),
                F.sum((F.col("est") == F.col("true_cnt")).cast("int"))
                .cast("bigint")
                .alias("exact_keys"),
            ).select(
                "w_buckets",
                "n_keys",
                "total_true",
                "total_overest",
                "exact_keys",
                F.expr(
                    "CAST((total_overest * 10000) DIV total_true AS BIGINT)"
                ).alias("overest_share_bp"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_sk10_bloom_fpr_curve(spark, sf_dir):
    # the Bloom-filter SIZING artifact (ss19/mm6/dd23 for membership
    # filters — the curve the bits-per-key budget is chosen from):
    # measured false-positive rate at m = 2¹²/2¹⁴/2¹⁶ bits, same
    # k=3 hashes, build = the standing snapshot's fingerprints
    # (doc_id < 250), probes = every doc. Truth membership is exact
    # BY VALUE (fingerprint semi-join, computed once); per m the
    # probe is sk2's broadcast-bits pass, so the curve costs three
    # bounded passes over one fingerprint projection and the md5
    # basis makes every false positive deterministic and
    # oracle-checkable. fpr_bp = false_pos·10⁴ DIV true_negatives.
    from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    ).localCheckpoint(eager=False)
    build = fp.filter(F.col("doc_id") < 250)
    member = (
        fp.join(
            build.select("fingerprint").distinct(),
            "fingerprint",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("_m", F.lit(1))
    )
    truth = fp.select("doc_id").join(member, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("_m"), F.lit(0)).alias("is_member")
    )
    outs = []
    for m in (1 << 12, 1 << 14, 1 << 16):
        bits = bloom_build(build, F.col("fingerprint"), m=m)
        probed = bloom_probe(fp, bits, F.col("fingerprint"), "doc_id", m=m)
        j = probed.join(truth, "doc_id")
        outs.append(
            j.agg(
                F.lit(m).cast("int").alias("m_bits"),
                F.count(F.lit(1)).cast("bigint").alias("n_probes"),
                F.sum("is_member").cast("bigint").alias("n_members"),
                F.sum(
                    ((F.col("hit") == 1) & (F.col("is_member") == 0)).cast(
                        "int"
                    )
                )
                .cast("bigint")
                .alias("n_false_pos"),
            ).select(
                "m_bits",
                "n_probes",
                "n_members",
                "n_false_pos",
                F.expr(
                    "CAST(CASE WHEN n_probes = n_members THEN 0"
                    " ELSE (n_false_pos * 10000)"
                    " DIV (n_probes - n_members) END AS BIGINT)"
                ).alias("fpr_bp"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_sk2_bloom(spark, sf_dir):
    # Bloom membership: filter built from the old snapshot's content
    # fingerprints, probed by every doc — md5 basis makes false
    # positives deterministic and oracle-checkable
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    bits = bloom_build(
        fp.filter(F.col("doc_id") < 250), F.col("fingerprint")
    )
    return bloom_probe(fp, bits, F.col("fingerprint"), "doc_id")


def q_sk3_cms(spark, sf_dir):
    # count-min frequency sketch over the lineitem partkey stream:
    # 4×1024 counters whatever the stream size; per-key estimate is
    # min over rows, always ≥ the true count
    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_partkey"), F.col("l_partkey").cast("string").alias("key")
    )
    counters = cms_counters(src, F.col("key"))
    keys = src.groupBy("l_partkey", "key").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    est = cms_estimates(keys, counters, F.col("key"), "l_partkey")
    return (
        keys.join(est, "l_partkey")
        .select(
            "l_partkey",
            F.col("est"),
            F.col("true_cnt").cast("int").alias("true_cnt"),
            (F.col("est") - F.col("true_cnt")).cast("int").alias("overcount"),
        )
    )

def q_sk13_cms_depth_curve(spark, sf_dir):
    # the OTHER count-min knob (r10; sk11 priced the width w — this
    # prices the depth d): measured overestimate with d = 1/2/4 rows
    # at fixed w = 2¹⁰, over the same lineitem partkey stream. Depth
    # buys failure-probability (P[err > ε] ≤ e^−d), width buys ε —
    # the two knobs cost the same memory per unit, and this pair of
    # curves is how the budget is split. The d-row counter matrix is
    # built ONCE (row j is independent of d); the depth-d estimate is
    # the min over rows j < d, so all three estimates come out of ONE
    # per-key conditional-min groupBy, one 1-row aggregate, and a
    # 3-way stack. Key domain pinned once (sk11's discipline) — the
    # raw stream is scanned exactly once whatever the curve length.
    li = load_table(spark, sf_dir, "lineitem")
    keyed = (
        li.select(F.col("l_partkey").cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .localCheckpoint(eager=False)
    )
    w = 1 << 10
    pos = keyed.select(
        F.explode(cms_entries(F.col("key"), w=w)).alias("e"), "true_cnt"
    ).select("e.j", "e.bucket", "true_cnt")
    counters = pos.groupBy("j", "bucket").agg(
        F.sum("true_cnt").alias("cnt")
    )
    perkey = (
        keyed.select(
            "key", F.explode(cms_entries(F.col("key"), w=w)).alias("e")
        )
        .select("key", "e.j", "e.bucket")
        .join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("key")
        .agg(
            F.min(F.when(F.col("j") == 0, F.col("cnt")))
            .cast("bigint")
            .alias("est1"),
            F.min(F.when(F.col("j") < 2, F.col("cnt")))
            .cast("bigint")
            .alias("est2"),
            F.min("cnt").cast("bigint").alias("est4"),
        )
    )
    one = keyed.join(perkey, "key").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_keys"),
        F.sum("true_cnt").cast("bigint").alias("_total_true"),
        *[
            c
            for d in (1, 2, 4)
            for c in (
                F.sum(F.col(f"est{d}") - F.col("true_cnt"))
                .cast("bigint")
                .alias(f"_o{d}"),
                F.sum((F.col(f"est{d}") == F.col("true_cnt")).cast("int"))
                .cast("bigint")
                .alias(f"_x{d}"),
            )
        ],
    )
    return one.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{d}, _o{d}, _x{d}" for d in (1, 2, 4))
            + ") AS (d_rows, total_overest, exact_keys)"
        ),
        "_n_keys",
        "_total_true",
    ).select(
        F.col("d_rows").cast("int").alias("d_rows"),
        F.col("_n_keys").alias("n_keys"),
        F.col("_total_true").alias("total_true"),
        "total_overest",
        "exact_keys",
        F.expr(
            "CAST((total_overest * 10000) DIV _total_true AS BIGINT)"
        ).alias("overest_share_bp"),
    )


QUERIES = {
    "sk13_cms_depth_curve": q_sk13_cms_depth_curve,
    "sk8_heavy_hitters": q_sk8_heavy_hitters,
    "sk9_group_heavy_hitters": q_sk9_group_heavy_hitters,
    "sk6_kmv_set_ops": q_sk6_kmv_set_ops,
    "sk7_quantile_sketch": q_sk7_quantile_sketch,
    "sk1_kmv_distinct": q_sk1_kmv_distinct,
    "sk4_hll_distinct": q_sk4_hll_distinct,
    "sk12_hll_precision_curve": q_sk12_hll_precision_curve,
    "sk5_hll_rollup": q_sk5_hll_rollup,
    "sk2_bloom": q_sk2_bloom,
    "sk11_cms_width_curve": q_sk11_cms_width_curve,
    "sk10_bloom_fpr_curve": q_sk10_bloom_fpr_curve,
    "sk3_cms": q_sk3_cms,
}

def _sk12_oracle_sql() -> str:
    """Generated from _SK12_PRECISIONS so the constants cannot drift;
    the alpha expression is spelled with the same op sequence the
    Python constants were computed with (m is a power of two, so the
    doubles agree bit-for-bit — the sk4 precedent)."""
    cells = []
    for _p, m, _alpha, div, wb in _SK12_PRECISIONS:
        alpha_expr = (
            "0.709" if m == 64 else f"(0.7213 / (1.0 + 1.079 / {m}))"
        )
        cells.append(f"""
            rho{m} AS (
              SELECT h // {div} AS register,
                     max(CASE WHEN h % {div} = 0 THEN {wb + 1}
                         ELSE {wb + 1} - length(bin(h % {div})) END) AS rho
              FROM h GROUP BY 1
            ),
            cell{m} AS (
              SELECT {m} AS m, CAST(count(*) AS INTEGER) AS observed,
                     {alpha_expr} * {m} * {m}
                       / (sum(power(2.0, -rho))
                          + CAST({m} - count(*) AS DOUBLE)) AS raw_estimate
              FROM rho{m}
            )""")
    return f"""
            WITH h AS (
              SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))::BIGINT AS h
              FROM lineitem
            ),
            ex AS (
              SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
                AS exact_distinct FROM lineitem
            ),{",".join(cells)}
            SELECT CAST(m AS INTEGER) AS m, observed, raw_estimate,
                   exact_distinct,
                   (raw_estimate - CAST(exact_distinct AS DOUBLE))
                     / CAST(exact_distinct AS DOUBLE) * 10000.0 AS err_bp
            FROM (
              SELECT * FROM cell64
              UNION ALL SELECT * FROM cell256
              UNION ALL SELECT * FROM cell1024
            ) CROSS JOIN ex
"""


def oracles() -> dict[str, str]:
    return {
        "sk12_hll_precision_curve": _sk12_oracle_sql(),
        "sk9_group_heavy_hitters": """
            SELECT event_type AS grp,
                   CAST(user_id AS VARCHAR) AS key,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY 1, 2 HAVING count(*) >= 12
""",
        "sk8_heavy_hitters": """
                    SELECT CAST(user_id AS VARCHAR) AS key,
                           count(*) AS n
                    FROM events GROUP BY 1 HAVING count(*) >= 80
                """,
        "sk4_hll_distinct": """
                    WITH h AS (
                      SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))::BIGINT AS h
                      FROM lineitem
                    ),
                    parts AS (
                      SELECT h // 4398046511104 AS register,
                             h % 4398046511104 AS w
                      FROM h
                    ),
                    rho AS (
                      SELECT register,
                             max(CASE WHEN w = 0 THEN 43
                                      ELSE 43 - length(bin(w)) END) AS rho
                      FROM parts GROUP BY register
                    )
                    SELECT 1024 AS m, CAST(count(*) AS INTEGER) AS observed,
                           (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                             / (sum(power(2.0, -rho))
                                + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
                    FROM rho
                """,
        "sk5_hll_rollup": """
                    -- each level computed DIRECTLY from the raw rows; equality
                    -- with the engine's merged-register path IS the sketch
                    -- mergeability property under oracle check
                    WITH rel AS (
                      SELECT n.n_name, r.r_name, CAST(o.o_custkey AS VARCHAR) AS cust
                      FROM orders o
                      JOIN customer c ON o.o_custkey = c.c_custkey
                      JOIN nation n ON c.c_nationkey = n.n_nationkey
                      JOIN region r ON n.n_regionkey = r.r_regionkey
                    ),
                    parts AS (
                      SELECT n_name, r_name,
                             (('0x' || substr(md5(cust), 1, 13))::BIGINT)
                               // 4398046511104 AS register,
                             (('0x' || substr(md5(cust), 1, 13))::BIGINT)
                               % 4398046511104 AS w
                      FROM rel
                    ),
                    rho_nation AS (
                      SELECT n_name, register,
                             max(CASE WHEN w = 0 THEN 43
                                      ELSE 43 - length(bin(w)) END) AS rho
                      FROM parts GROUP BY n_name, register
                    ),
                    rho_region AS (
                      SELECT r_name, register,
                             max(CASE WHEN w = 0 THEN 43
                                      ELSE 43 - length(bin(w)) END) AS rho
                      FROM parts GROUP BY r_name, register
                    ),
                    rho_global AS (
                      SELECT register,
                             max(CASE WHEN w = 0 THEN 43
                                      ELSE 43 - length(bin(w)) END) AS rho
                      FROM parts GROUP BY register
                    )
                    SELECT 'nation' AS level, n_name AS key, 1024 AS m,
                           CAST(count(*) AS INTEGER) AS observed,
                           (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                             / (sum(power(2.0, -rho))
                                + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
                    FROM rho_nation GROUP BY n_name
                    UNION ALL
                    SELECT 'region' AS level, r_name AS key, 1024 AS m,
                           CAST(count(*) AS INTEGER) AS observed,
                           (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                             / (sum(power(2.0, -rho))
                                + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
                    FROM rho_region GROUP BY r_name
                    UNION ALL
                    SELECT 'global' AS level, 'ALL' AS key, 1024 AS m,
                           CAST(count(*) AS INTEGER) AS observed,
                           (0.7213 / (1.0 + 1.079 / 1024)) * 1024 * 1024
                             / (sum(power(2.0, -rho))
                                + CAST(1024 - count(*) AS DOUBLE)) AS raw_estimate
                    FROM rho_global
                """,
        "sk6_kmv_set_ops": f"""
                    WITH a AS (
                      SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
                      FROM lineitem WHERE CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                    ),
                    b AS (
                      SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
                      FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
                    ),
                    tagged AS (
                      SELECT h, 1 AS in_a, 0 AS in_b FROM a
                      UNION ALL
                      SELECT h, 0 AS in_a, 1 AS in_b FROM b
                    ),
                    merged AS (
                      SELECT h, max(in_a) AS in_a, max(in_b) AS in_b
                      FROM tagged GROUP BY h
                    ),
                    kmin AS (SELECT * FROM merged ORDER BY h LIMIT 256),
                    base AS (
                      SELECT CAST(count(*) AS INTEGER) AS k_used,
                             max(h) AS kth_hash,
                             CAST(sum(in_a * in_b) AS INTEGER) AS n_both
                      FROM kmin
                    )
                    SELECT k_used, kth_hash, n_both,
                           CAST(k_used - 1 AS DOUBLE) * 4294967296.0 / kth_hash
                             AS union_est,
                           (CAST(n_both AS DOUBLE)
                            * (CAST(k_used - 1 AS DOUBLE) * 4294967296.0 / kth_hash))
                             / CAST(k_used AS DOUBLE) AS inter_est,
                           CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)
                             AS jaccard_est
                    FROM base
                """,
        "sk7_quantile_sketch": """
                    WITH b AS (
                      SELECT CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bucket,
                             count(*) AS cnt
                      FROM lineitem GROUP BY 1
                    ),
                    c AS (
                      SELECT bucket, cnt,
                             CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
                      FROM b
                    ),
                    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM b),
                    qs (q_num, q_den) AS (VALUES (1, 2), (19, 20), (99, 100)),
                    ks AS (
                      SELECT q_num, q_den,
                             (n_total * CAST(q_num AS BIGINT)
                              + CAST(q_den AS BIGINT) - 1) // CAST(q_den AS BIGINT)
                               AS k,
                             n_total
                      FROM qs, n
                    )
                    SELECT q_num, q_den, k, n_total, c.bucket,
                           CAST(c.bucket AS DOUBLE) * 1000.0
                             + 1000.0 * (CAST(ks.k - (c.cum - c.cnt) AS DOUBLE)
                                         / CAST(c.cnt AS DOUBLE)) AS est
                    FROM ks JOIN c ON c.cum >= ks.k AND (c.cum - c.cnt) < ks.k
                """,
        "sk1_kmv_distinct": f"""
                    WITH h AS (
                      SELECT DISTINCT {_HASH32.format(x="CAST(l_partkey AS VARCHAR)")} AS h
                      FROM lineitem
                    ),
                    kmin AS (SELECT h FROM h ORDER BY h LIMIT 256)
                    SELECT CAST(count(*) AS INTEGER) AS k, max(h) AS kth_hash,
                           CAST(count(*) - 1 AS DOUBLE) * 4294967296.0 / max(h) AS estimate
                    FROM kmin
                """,
        "sk13_cms_depth_curve": f"""
            WITH keyed AS MATERIALIZED (
              SELECT CAST(l_partkey AS VARCHAR) AS key,
                     CAST(count(*) AS BIGINT) AS true_cnt
              FROM lineitem GROUP BY 1
            ),
            pos AS MATERIALIZED (
              SELECT key, true_cnt, 0 AS j, ('0x' || substr(md5('cms0:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 1 AS j, ('0x' || substr(md5('cms1:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 2 AS j, ('0x' || substr(md5('cms2:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 3 AS j, ('0x' || substr(md5('cms3:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
            ),
            counters AS (
              SELECT j, bucket, sum(true_cnt) AS cnt
              FROM pos GROUP BY j, bucket
            ),
            perkey AS (
              SELECT p.key,
                     CAST(min(CASE WHEN p.j = 0 THEN c.cnt END) AS BIGINT)
                       AS est1,
                     CAST(min(CASE WHEN p.j < 2 THEN c.cnt END) AS BIGINT)
                       AS est2,
                     CAST(min(c.cnt) AS BIGINT) AS est4
              FROM pos p JOIN counters c
                ON p.j = c.j AND p.bucket = c.bucket
              GROUP BY p.key
            ),
            agg AS MATERIALIZED (
              SELECT CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(k.true_cnt) AS BIGINT) AS total_true,
                     CAST(sum(p.est1 - k.true_cnt) AS BIGINT) AS o1,
                     CAST(sum(CASE WHEN p.est1 = k.true_cnt THEN 1 ELSE 0 END) AS BIGINT) AS x1,
                     CAST(sum(p.est2 - k.true_cnt) AS BIGINT) AS o2,
                     CAST(sum(CASE WHEN p.est2 = k.true_cnt THEN 1 ELSE 0 END) AS BIGINT) AS x2,
                     CAST(sum(p.est4 - k.true_cnt) AS BIGINT) AS o4,
                     CAST(sum(CASE WHEN p.est4 = k.true_cnt THEN 1 ELSE 0 END) AS BIGINT) AS x4
              FROM keyed k JOIN perkey p ON k.key = p.key
            )
            SELECT CAST(d_rows AS INTEGER) AS d_rows, n_keys, total_true,
                   total_overest, exact_keys,
                   CAST((total_overest * 10000) // total_true AS BIGINT)
                     AS overest_share_bp
            FROM (
              SELECT 1 AS d_rows, n_keys, total_true,
                     o1 AS total_overest, x1 AS exact_keys FROM agg
              UNION ALL SELECT 2, n_keys, total_true, o2, x2 FROM agg
              UNION ALL SELECT 4, n_keys, total_true, o4, x4 FROM agg
            )
""",
        "sk11_cms_width_curve": f"""
            WITH keyed AS MATERIALIZED (
              SELECT CAST(l_partkey AS VARCHAR) AS key,
                     CAST(count(*) AS BIGINT) AS true_cnt
              FROM lineitem GROUP BY 1
            ),
            pos_256 AS (
              SELECT key, true_cnt, 0 AS j, ('0x' || substr(md5('cms0:' || key), 1, 8))::BIGINT % 256 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 1 AS j, ('0x' || substr(md5('cms1:' || key), 1, 8))::BIGINT % 256 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 2 AS j, ('0x' || substr(md5('cms2:' || key), 1, 8))::BIGINT % 256 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 3 AS j, ('0x' || substr(md5('cms3:' || key), 1, 8))::BIGINT % 256 AS bucket FROM keyed
            ),
            counters_256 AS (
              SELECT j, bucket, sum(true_cnt) AS cnt
              FROM pos_256 GROUP BY j, bucket
            ),
            est_256 AS (
              SELECT p.key, CAST(min(c.cnt) AS BIGINT) AS est
              FROM pos_256 p JOIN counters_256 c
                ON p.j = c.j AND p.bucket = c.bucket
              GROUP BY p.key
            ),
            cell_256 AS (
              SELECT 256 AS w_buckets,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(k.true_cnt) AS BIGINT) AS total_true,
                     CAST(sum(e.est - k.true_cnt) AS BIGINT)
                       AS total_overest,
                     CAST(sum(CASE WHEN e.est = k.true_cnt THEN 1 ELSE 0 END)
                       AS BIGINT) AS exact_keys
              FROM keyed k JOIN est_256 e ON k.key = e.key
            ),
            pos_1024 AS (
              SELECT key, true_cnt, 0 AS j, ('0x' || substr(md5('cms0:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 1 AS j, ('0x' || substr(md5('cms1:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 2 AS j, ('0x' || substr(md5('cms2:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 3 AS j, ('0x' || substr(md5('cms3:' || key), 1, 8))::BIGINT % 1024 AS bucket FROM keyed
            ),
            counters_1024 AS (
              SELECT j, bucket, sum(true_cnt) AS cnt
              FROM pos_1024 GROUP BY j, bucket
            ),
            est_1024 AS (
              SELECT p.key, CAST(min(c.cnt) AS BIGINT) AS est
              FROM pos_1024 p JOIN counters_1024 c
                ON p.j = c.j AND p.bucket = c.bucket
              GROUP BY p.key
            ),
            cell_1024 AS (
              SELECT 1024 AS w_buckets,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(k.true_cnt) AS BIGINT) AS total_true,
                     CAST(sum(e.est - k.true_cnt) AS BIGINT)
                       AS total_overest,
                     CAST(sum(CASE WHEN e.est = k.true_cnt THEN 1 ELSE 0 END)
                       AS BIGINT) AS exact_keys
              FROM keyed k JOIN est_1024 e ON k.key = e.key
            ),
            pos_4096 AS (
              SELECT key, true_cnt, 0 AS j, ('0x' || substr(md5('cms0:' || key), 1, 8))::BIGINT % 4096 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 1 AS j, ('0x' || substr(md5('cms1:' || key), 1, 8))::BIGINT % 4096 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 2 AS j, ('0x' || substr(md5('cms2:' || key), 1, 8))::BIGINT % 4096 AS bucket FROM keyed
              UNION ALL SELECT key, true_cnt, 3 AS j, ('0x' || substr(md5('cms3:' || key), 1, 8))::BIGINT % 4096 AS bucket FROM keyed
            ),
            counters_4096 AS (
              SELECT j, bucket, sum(true_cnt) AS cnt
              FROM pos_4096 GROUP BY j, bucket
            ),
            est_4096 AS (
              SELECT p.key, CAST(min(c.cnt) AS BIGINT) AS est
              FROM pos_4096 p JOIN counters_4096 c
                ON p.j = c.j AND p.bucket = c.bucket
              GROUP BY p.key
            ),
            cell_4096 AS (
              SELECT 4096 AS w_buckets,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(k.true_cnt) AS BIGINT) AS total_true,
                     CAST(sum(e.est - k.true_cnt) AS BIGINT)
                       AS total_overest,
                     CAST(sum(CASE WHEN e.est = k.true_cnt THEN 1 ELSE 0 END)
                       AS BIGINT) AS exact_keys
              FROM keyed k JOIN est_4096 e ON k.key = e.key
            ),
            curve AS (
              SELECT * FROM cell_256
            UNION ALL SELECT * FROM cell_1024
            UNION ALL SELECT * FROM cell_4096
            )
            SELECT CAST(w_buckets AS INTEGER) AS w_buckets, n_keys,
                   total_true, total_overest, exact_keys,
                   CAST((total_overest * 10000) // total_true AS BIGINT)
                     AS overest_share_bp
            FROM curve
""",
        "sk10_bloom_fpr_curve": f"""
            WITH fp AS (SELECT doc_id, md5({_NORM}) AS f FROM documents),
            members AS (
              SELECT DISTINCT f FROM fp WHERE doc_id < 250
            ),
            truth AS (
              SELECT fp.doc_id,
                     CASE WHEN m.f IS NOT NULL THEN 1 ELSE 0 END AS is_member
              FROM fp LEFT JOIN members m ON fp.f = m.f
            ),
            curve AS (
            SELECT CAST(4096 AS INTEGER) AS m_bits,
                   CAST((SELECT count(*) FROM fp) AS BIGINT) AS n_probes,
                   CAST((SELECT count(*) FROM truth WHERE is_member = 1)
                     AS BIGINT) AS n_members,
                   CAST((SELECT count(*) FROM (
                      WITH bits_4096 AS (
                        SELECT DISTINCT bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp WHERE doc_id < 250)
                      ),
                      ppos_4096 AS (
                        SELECT DISTINCT doc_id, bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 4096 AS bit FROM fp)
                      ),
                      stats_4096 AS (
                        SELECT p.doc_id, count(*) AS n_pos,
                               sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
                        FROM ppos_4096 p LEFT JOIN bits_4096 b ON p.bit = b.bit
                        GROUP BY p.doc_id
                      )
                      SELECT s.doc_id FROM stats_4096 s JOIN truth t ON s.doc_id = t.doc_id
                      WHERE s.n_hit = s.n_pos AND t.is_member = 0
                   )) AS BIGINT) AS n_false_pos
            UNION ALL
            SELECT CAST(16384 AS INTEGER) AS m_bits,
                   CAST((SELECT count(*) FROM fp) AS BIGINT) AS n_probes,
                   CAST((SELECT count(*) FROM truth WHERE is_member = 1)
                     AS BIGINT) AS n_members,
                   CAST((SELECT count(*) FROM (
                      WITH bits_16384 AS (
                        SELECT DISTINCT bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp WHERE doc_id < 250)
                      ),
                      ppos_16384 AS (
                        SELECT DISTINCT doc_id, bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 16384 AS bit FROM fp)
                      ),
                      stats_16384 AS (
                        SELECT p.doc_id, count(*) AS n_pos,
                               sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
                        FROM ppos_16384 p LEFT JOIN bits_16384 b ON p.bit = b.bit
                        GROUP BY p.doc_id
                      )
                      SELECT s.doc_id FROM stats_16384 s JOIN truth t ON s.doc_id = t.doc_id
                      WHERE s.n_hit = s.n_pos AND t.is_member = 0
                   )) AS BIGINT) AS n_false_pos
            UNION ALL
            SELECT CAST(65536 AS INTEGER) AS m_bits,
                   CAST((SELECT count(*) FROM fp) AS BIGINT) AS n_probes,
                   CAST((SELECT count(*) FROM truth WHERE is_member = 1)
                     AS BIGINT) AS n_members,
                   CAST((SELECT count(*) FROM (
                      WITH bits_65536 AS (
                        SELECT DISTINCT bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp WHERE doc_id < 250
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp WHERE doc_id < 250)
                      ),
                      ppos_65536 AS (
                        SELECT DISTINCT doc_id, bit FROM (SELECT doc_id, ('0x' || substr(md5('bloom0:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom1:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp
              UNION ALL SELECT doc_id, ('0x' || substr(md5('bloom2:' || f), 1, 8))::BIGINT % 65536 AS bit FROM fp)
                      ),
                      stats_65536 AS (
                        SELECT p.doc_id, count(*) AS n_pos,
                               sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
                        FROM ppos_65536 p LEFT JOIN bits_65536 b ON p.bit = b.bit
                        GROUP BY p.doc_id
                      )
                      SELECT s.doc_id FROM stats_65536 s JOIN truth t ON s.doc_id = t.doc_id
                      WHERE s.n_hit = s.n_pos AND t.is_member = 0
                   )) AS BIGINT) AS n_false_pos
            )
            SELECT m_bits, n_probes, n_members, n_false_pos,
                   CAST(CASE WHEN n_probes = n_members THEN 0
                        ELSE (n_false_pos * 10000) // (n_probes - n_members)
                        END AS BIGINT) AS fpr_bp
            FROM curve
""",
        "sk2_bloom": f"""
                    WITH fp AS (SELECT doc_id, md5({_NORM}) AS f FROM documents),
                    bits AS (
                      SELECT DISTINCT bit FROM ({_BLOOM_POS.format(src="fp WHERE doc_id < 250")})
                    ),
                    ppos AS (
                      SELECT DISTINCT doc_id, bit FROM ({_BLOOM_POS.format(src="fp")})
                    ),
                    stats AS (
                      SELECT p.doc_id, count(*) AS n_pos,
                             sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                               AS n_hit
                      FROM ppos p LEFT JOIN bits b ON p.bit = b.bit
                      GROUP BY p.doc_id
                    )
                    SELECT doc_id,
                           CAST(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END AS INTEGER)
                             AS hit
                    FROM stats
                """,
        "sk3_cms": f"""
                    WITH src AS (
                      SELECT l_partkey, CAST(l_partkey AS VARCHAR) AS key
                      FROM lineitem
                    ),
                    pos AS ({_CMS_POS.format(src="src", keyexpr="key")}),
                    counters AS (
                      SELECT j, bucket, count(*) AS cnt FROM pos GROUP BY j, bucket
                    ),
                    keys AS (
                      SELECT l_partkey, key, count(*) AS true_cnt
                      FROM src GROUP BY l_partkey, key
                    ),
                    kp AS ({_CMS_POS.format(src="keys", keyexpr="key")}
                    ),
                    est AS (
                      SELECT kp.l_partkey, min(c.cnt) AS est
                      FROM kp JOIN counters c ON kp.j = c.j AND kp.bucket = c.bucket
                      GROUP BY kp.l_partkey
                    )
                    SELECT k.l_partkey, CAST(e.est AS INTEGER) AS est,
                           CAST(k.true_cnt AS INTEGER) AS true_cnt,
                           CAST(e.est - k.true_cnt AS INTEGER) AS overcount
                    FROM keys k JOIN est e ON k.l_partkey = e.l_partkey
                """,
    }
