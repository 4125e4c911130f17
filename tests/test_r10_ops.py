"""Hand fixtures for the r10 design-artifact operators — pinning the
edge semantics tri-SF exactness can't isolate (zero-fanout rows,
missing-hour autocorrelation pairs, threshold boundary arithmetic)."""

import datetime
import os
import tempfile

from pyspark.sql import functions as F  # noqa: F401

from enriched_crime_incident_data_pipeline_spark.registry import spark_queries


def test_dq15_counts_zero_fanout_orders(spark):
    """An order with NO lineitems lands in the fanout=0 bucket — the
    left join from the parent domain, not an inner join that would
    silently drop it (the whole point of a fan-out audit)."""
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    # order 1 -> 2 items, order 2 -> 1 item, order 3 -> none
    spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "l_orderkey bigint, l_linenumber bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r["fanout"]: (r["n_orders"], r["share_bp"])
        for r in spark_queries()["dq15_fk_fanout_profile"](spark, d).collect()
    }
    assert got == {0: (1, 3333), 1: (1, 3333), 2: (1, 3333)}


def test_ts12_pairs_require_both_hours_observed(spark):
    """Autocorrelation pairs exist only where BOTH hours have events
    (absent hours are missing data, not zeros): hours 0,1,2 and 4
    observed -> lag-1 pairs are (0,1), (1,2) only — the 2->3 and
    4->5 shifts find no partner; perfectly linear counts give
    autocorr 1.0 up to float identity."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # hour h gets h+1 events for h in (0, 1, 2); hour 4 gets 1 event
    for h, n in [(0, 1), (1, 2), (2, 3), (4, 1)]:
        for _ in range(n):
            rows.append((eid, t0 + datetime.timedelta(hours=h), 1))
            eid += 1
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["lag_hours"]: (r["n_pairs"], r["autocorr"])
        for r in spark_queries()["ts12_autocorr_profile"](spark, d).collect()
    }
    # lag 1: pairs (1,2) and (2,3) — two points, perfectly linear
    assert got[1][0] == 2
    assert abs(got[1][1] - 1.0) < 1e-12
    # lags 24/168: no pairs -> groups absent entirely
    assert set(got) == {1}


def test_dd27_threshold_boundary_is_inclusive_integer(spark):
    """jaccard >= 0.5 is evaluated as intersect*2 >= union*1 — a pair
    at exactly 0.5 (i=2, u=4) counts at the 5000 bp threshold; no
    float representation of 0.5 is involved."""
    # two docs sharing exactly half their shingles after hashing is
    # hard to pin by hand; instead pin the arithmetic through the
    # curve's monotonicity on the real fixture
    sf = "/root/testdata/sf0.001"
    rows = {
        r["threshold_bp"]: r["n_pairs"]
        for r in spark_queries()["dd27_jaccard_threshold_curve"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {5000, 7000, 9000}
    assert rows[5000] >= rows[7000] >= rows[9000]


def test_ts14_cusum_peaks_at_level_shift(spark):
    """A step change in the daily rate puts the CUSUM max exactly at
    the last pre-shift day, in exact integers: type A runs 1/day for
    3 days then 3/day for 3 days -> N=6, T=12, s_3 = 6*6 - 3*12 =
    -18 is the extreme (|s|=18, bp = 18*10000 DIV 72 = 2500). Type B
    exercises the zero-filled spine: all 5 events on day 1, the
    other five global days absent from its raw rows -> s_1 = 25."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 1), (2, 1), (3, 3), (4, 3), (5, 3)]:
        for _ in range(n):
            rows.append((eid, t0 + datetime.timedelta(days=day), "A"))
            eid += 1
    for _ in range(5):
        rows.append((eid, t0, "B"))
        eid += 1
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["event_type"]: r
        for r in spark_queries()["ts14_changepoint_profile"](
            spark, d
        ).collect()
    }
    a = got["A"]
    assert (a["n_days"], a["total_events"], a["cusum_max"]) == (6, 12, 18)
    assert a["cusum_max_bp"] == 2500
    assert a["changepoint_day"] == datetime.date(2024, 3, 3)
    b = got["B"]
    # zero-filled: N=6 global days, T=5; s_1 = 6*5 - 1*5 = 25
    assert (b["n_days"], b["total_events"], b["cusum_max"]) == (6, 5, 25)
    assert b["changepoint_day"] == datetime.date(2024, 3, 1)


def test_ta17_attributes_fail_counts_per_rule(spark):
    """Per-rule attribution on a hand corpus: one too-short doc, one
    too-long stopword-free doc, one healthy doc. len_min and len_max
    each catch exactly their doc; tokens_lost carries the failing
    docs' token mass; 'any' is the de-duped union (2 of 3 docs)."""
    d = tempfile.mkdtemp()
    healthy = "the cat sat on the mat and the dog ran off today"
    spark.createDataFrame(
        [
            (1, "tiny doc"),
            (2, "lorem " * 600),
            (3, healthy),
        ],
        "doc_id bigint, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["rule"]: r
        for r in spark_queries()["ta17_filter_attribution"](
            spark, d
        ).collect()
    }
    assert set(got) == {"len_min", "len_max", "stopword", "digit", "punct", "any"}
    assert (got["len_min"]["n_fail"], got["len_min"]["tokens_lost"]) == (1, 2)
    assert (got["len_max"]["n_fail"], got["len_max"]["tokens_lost"]) == (1, 600)
    assert got["len_max"]["fail_share_bp"] == 3333
    # doc 2 has zero stopwords; doc 1's two tokens are non-stopwords
    assert got["stopword"]["n_fail"] == 2
    assert got["digit"]["n_fail"] == 0
    # union: docs 1 and 2 fail, the healthy doc passes every rule
    assert (got["any"]["n_fail"], got["any"]["tokens_lost"]) == (2, 602)
    assert got["any"]["fail_share_bp"] == 6666


def test_gr17_consistent_with_gr4_triangle_counts(spark):
    """Cross-operator pin on the real fixture: gr4 publishes per-node
    triangle membership over the SAME near-dup edge list, so summing
    it counts each triangle exactly 3 times; gr17's global count must
    agree, and the wedge count bounds triangles (every triangle
    closes 3 wedges)."""
    sf = "/root/testdata/sf0.001"
    qs = spark_queries()
    row = qs["gr17_transitivity"](spark, sf).collect()[0]
    per_node = qs["gr4_triangles"](spark, sf).agg(
        F.sum("n_triangles").alias("s")
    ).collect()[0]["s"]
    assert (per_node or 0) == 3 * row["n_triangles"]
    assert row["n_wedges"] >= 3 * row["n_triangles"]
    if row["n_wedges"]:
        assert row["transitivity_bp"] == (
            row["n_triangles"] * 3 * 10000
        ) // row["n_wedges"]


def test_dd28_histogram_partitions_sum_to_candidates(spark):
    """Each k-slice of the error histogram is a partition of the SAME
    candidate-pair set (one relation, stacked 3 ways): per-k n_pairs
    totals are equal across k and match dd16's per-pair report; the
    estimator can only take k+1 distinct values so the k=4 histogram
    is confined to coarser error levels than k=16."""
    sf = "/root/testdata/sf0.001"
    qs = spark_queries()
    rows = qs["dd28_sig_length_curve"](spark, sf).collect()
    per_k = {}
    for r in rows:
        per_k.setdefault(r["k"], 0)
        per_k[r["k"]] += r["n_pairs"]
    n16 = qs["dd16_minhash_estimate"](spark, sf).count()
    assert per_k == {4: n16, 8: n16, 16: n16}
    for r in rows:
        assert 0 <= r["err_bucket_bp"] <= 10000
        assert 0 < r["share_bp"] <= 10000


def test_ss22_buckets_by_normsq_bit_length(spark):
    """Hand vectors: [0.001, 0.002] -> micro units (1000, 2000) ->
    normsq 5,000,000 (23 bits); the zero vector lands in bucket 1
    with normsq 0 (bin(0) = '0'). Shares split 5000/5000."""
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, [0.001, 0.002]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<float>",
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    got = {
        r["bucket"]: r
        for r in spark_queries()["ss22_norm_profile"](spark, d).collect()
    }
    assert set(got) == {23, 1}
    assert (got[23]["min_normsq"], got[23]["max_normsq"]) == (5000000, 5000000)
    assert (got[1]["min_normsq"], got[1]["max_normsq"]) == (0, 0)
    assert got[23]["share_bp"] == 5000 and got[1]["share_bp"] == 5000


def test_sk13_depth_curve_monotone_and_pins_sk11_cell(spark):
    """More sketch rows can only help: total_overest is non-increasing
    and exact_keys non-decreasing in d; the d=4 row IS sk11's
    w=1024 cell (same counters, same stream), a cross-operator pin."""
    sf = "/root/testdata/sf0.001"
    qs = spark_queries()
    rows = {r["d_rows"]: r for r in qs["sk13_cms_depth_curve"](spark, sf).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["total_overest"] >= rows[2]["total_overest"] >= rows[4]["total_overest"]
    assert rows[1]["exact_keys"] <= rows[2]["exact_keys"] <= rows[4]["exact_keys"]
    assert len({r["n_keys"] for r in rows.values()}) == 1
    sk11 = {
        r["w_buckets"]: r
        for r in qs["sk11_cms_width_curve"](spark, sf).collect()
    }[1024]
    assert rows[4]["total_overest"] == sk11["total_overest"]
    assert rows[4]["exact_keys"] == sk11["exact_keys"]


def test_geo3_coarser_cells_merge_points(spark):
    """Two points in distinct unit cells that share one g=16 cell:
    g1/g4 report two singleton cells and zero candidate pairs; g16
    reports one 2-point cell carrying the whole pair mass."""
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1,), (4,)], "c_custkey bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    rows = spark_queries()["geo3_grid_density_profile"](spark, d).collect()
    by_scheme = {}
    for r in rows:
        by_scheme.setdefault(r["scheme"], []).append(r)
    for g in ("g1", "g4"):
        (r,) = by_scheme[g]
        assert (r["bucket"], r["n_cells"], r["cand_pairs"], r["pair_share_bp"]) == (1, 2, 0, 0)
    (r,) = by_scheme["g16"]
    assert (r["bucket"], r["n_cells"], r["n_points"], r["cand_pairs"]) == (2, 1, 2, 1)
    assert r["pair_share_bp"] == 10000


def test_er6_thresholds_on_hand_names(spark):
    """Three names in one tail-2 block with pairwise distances
    1/2/2 and one name in its own block: 3 candidates, 1 pair at
    t<=1, all 3 at t<=2 and t<=3."""
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "CUST-AAA"), (2, "CUST-AAB"), (3, "CUST-AXY"), (4, "ZOTHER-Q")],
        "c_custkey bigint, c_name string",
    ).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    got = {
        r["threshold"]: r
        for r in spark_queries()["er6_distance_threshold_curve"](
            spark, d
        ).collect()
    }
    assert {t: (got[t]["n_pairs"], got[t]["n_candidates"]) for t in got} == {
        1: (1, 3), 2: (3, 3), 3: (3, 3)
    }
    assert got[1]["share_of_candidates_bp"] == 3333
    assert got[2]["share_of_candidates_bp"] == 10000


def test_ol4_catches_z_gate_masking(spark):
    """The textbook masking case the agreement audit exists for: 5
    outliers at 100 among 16 ones inflate sigma enough that NO row
    reaches |z| > 2.5 (z(100) ~ 1.79), while the robust gates (IQR
    fence and MAD, both degenerate-tight here) flag all 5 — so the
    histogram shows a (False, True, True) disagreement cell and no
    all-True cell."""
    d = tempfile.mkdtemp()
    t0 = datetime.datetime(2024, 3, 1)
    rows = [(i, t0, "A", 1.0) for i in range(16)] + [
        (100 + i, t0, "A", 100.0) for i in range(5)
    ]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["flag_z"], r["flag_iqr"], r["flag_mad"]): (
            r["n_rows"],
            r["share_bp"],
        )
        for r in spark_queries()["ol4_gate_agreement"](spark, d).collect()
    }
    assert got == {
        (False, False, False): (16, 7619),
        (False, True, True): (5, 2380),
    }


def test_sj3_prices_ideal_salt_split(spark):
    """90 hot rows + 10 'x' rows: unsalted the hot reducer holds 90%
    of the shuffle; s=4 cuts the max bucket to ceil(90/4)=23 (2300
    bp) at 8 buckets; s=16 to 6 rows (600 bp) at 26 buckets."""
    t0 = datetime.datetime(2024, 3, 1)
    rows = [(i, t0, "x") for i in range(100)]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["n_salts"]: r
        for r in spark_queries()["sj3_salt_factor_curve"](spark, d).collect()
    }
    for s, (mb, nb, bp) in {
        1: (90, 2, 9000), 4: (23, 8, 2300), 16: (6, 26, 600)
    }.items():
        r = got[s]
        assert (r["n_keys"], r["total_rows"], r["max_key_rows"]) == (2, 100, 90)
        assert (r["max_bucket_rows"], r["n_buckets"], r["max_bucket_share_bp"]) == (mb, nb, bp)


def test_tp20_sums_to_tp18_global_cells(spark):
    """Per-source attribution partitions tp18's global report: source
    rows sum to the global doc count and crossing count (same
    prefix-sum relation, same boundary predicate)."""
    sf = "/root/testdata/sf0.001"
    qs = spark_queries()
    per_src = qs["tp20_fragmentation_by_source"](spark, sf).collect()
    g = qs["tp18_fragmentation_report"](spark, sf).collect()[0]
    assert sum(r["n_docs"] for r in per_src) == g["n_docs"]
    assert sum(r["docs_crossing"] for r in per_src) == g["docs_crossing"]
    assert len(per_src) > 1  # the attribution is non-degenerate


def test_mm10_each_band_partitions_the_media(spark):
    """Every media row lands in exactly one bucket per band, so each
    of the 4 pigeonhole bands accounts for the same media total; the
    per-band share column sums to ~10000 bp wherever pairs exist."""
    sf = "/root/testdata/sf0.001"
    rows = spark_queries()["mm10_dhash_band_skew"](spark, sf).collect()
    per_band = {}
    shares = {}
    for r in rows:
        per_band[r["band_idx"]] = per_band.get(r["band_idx"], 0) + r["n_media"]
        shares[r["band_idx"]] = shares.get(r["band_idx"], 0) + r["pair_share_bp"]
    assert set(per_band) == {0, 1, 2, 3}
    assert len(set(per_band.values())) == 1
    for b, s in shares.items():
        assert s <= 10000


def test_dc11_bloom_admits_no_false_negatives(spark):
    """Structural pin of the Bloom guarantee on the real fixture: the
    (exact ∧ ¬bloom) cell cannot exist — every exactly-contaminated
    doc is also bloom-flagged; cell totals cover the whole train
    split and shares sum to ≤10000."""
    sf = "/root/testdata/sf0.001"
    qs = spark_queries()
    rows = qs["dc11_bloom_exact_agreement"](spark, sf).collect()
    cells = {
        (r["exact_contaminated"], r["bloom_contaminated"]): r["n_docs"]
        for r in rows
    }
    assert (True, False) not in cells
    n_train = qs["dc1_contamination"](spark, sf).count()
    assert sum(cells.values()) == n_train
    assert sum(r["share_bp"] for r in rows) <= 10000
