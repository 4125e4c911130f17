"""Idempotent append (ON CONFLICT DO NOTHING parity,
src/db/incidents.py:37-45) and strict-> watermark semantics
(src/scrape/normanpd.py:23-27,43)."""

from __future__ import annotations

import datetime as dt

from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
    dedup_by_key,
    idempotent_append,
)
from enriched_crime_incident_data_pipeline_spark.operators.watermark import (
    filter_after_watermark,
    max_date_watermark,
)


def test_dedup_within_batch(spark):
    df = spark.createDataFrame(
        [("k1", "x"), ("k1", "y"), ("k2", "z")], "incident_num string, v string"
    )
    assert dedup_by_key(df, "incident_num").count() == 2


def test_idempotent_append_skips_existing_keys(spark):
    batch = spark.createDataFrame(
        [("k1", "new"), ("k2", "new"), ("k2", "dup"), ("k3", "new")],
        "incident_num string, v string",
    )
    existing = spark.createDataFrame([("k1", "old")], "incident_num string, v string")
    inserted = idempotent_append(batch, existing, "incident_num")
    keys = sorted(r["incident_num"] for r in inserted.collect())
    assert keys == ["k2", "k3"]


def test_watermark_strictly_greater_at_date_granularity(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 4, 2), "old"),
            (dt.date(2024, 4, 3), "same-day"),
            (dt.date(2024, 4, 4), "new"),
            (None, "no-date"),
        ],
        "report_date date, tag string",
    )
    out = filter_after_watermark(df, "report_date", dt.date(2024, 4, 3))
    assert [r["tag"] for r in out.collect()] == ["new"]


def test_watermark_none_processes_all_dated_rows(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 4, 2), "a"), (None, "no-date")],
        "report_date date, tag string",
    )
    out = filter_after_watermark(df, "report_date", None)
    assert [r["tag"] for r in out.collect()] == ["a"]


def test_max_date_watermark(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 4, 3, 23, 59),), (dt.datetime(2024, 4, 1, 0, 0),)],
        "incident_ts timestamp",
    )
    assert max_date_watermark(df) == dt.date(2024, 4, 3)
    empty = spark.createDataFrame([], "incident_ts timestamp")
    assert max_date_watermark(empty) is None


def test_cdc_segments_shift_robust(spark):
    """The reason content-defined boundaries exist: insert ONE token
    at the head of a near-duplicate and (a) fixed 10-token windows
    all shift — nothing dedups — while (b) CDC boundaries
    re-synchronize within ~a window and the shared tail dedups
    segment-for-segment. Deterministic (md5 boundaries, fixed text)."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        cdc_segment_dedup,
        segment_dedup,
    )

    base = " ".join(f"w{i % 97}x{(i * 7) % 13}q{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, "zzz " + base)], "doc_id bigint, text string"
    )
    cdc = {r["doc_id"]: r for r in cdc_segment_dedup(docs).collect()}
    # doc 1 wins every race (lower id): fully kept
    assert cdc[1]["n_kept"] == cdc[1]["n_segs"]
    # doc 2: the head segment differs but the re-synchronized tail
    # dedups — strictly fewer kept than total, and the doc has
    # multiple segments (the boundary stream fired)
    assert cdc[2]["n_segs"] > 3
    assert cdc[2]["n_kept"] < cdc[2]["n_segs"]
    # fixed-offset windows: the one-token shift misaligns every
    # segment, so NOTHING dedups for doc 2
    fixed = {r["doc_id"]: r for r in segment_dedup(docs, seg_tokens=10).collect()}
    assert fixed[2]["n_kept"] * 10 >= 200  # all of doc 2 survives
    # and the CDC rebuild preserves kept-segment order/content: doc 1
    # round-trips to its own tokenized text
    assert cdc[1]["deduped_text"].split(" ") == base.split(" ")


def test_cdc_segments_hash_independent_roundtrip(spark):
    """The boundary hash only decides WHERE segments split, never
    correctness: on a duplicate-free corpus both the md5 (oracle
    basis) and xxhash64 (cluster fast path) variants keep every
    segment and reconstruct each document's tokenized text exactly;
    the shift-robust dedup behavior holds under both."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        cdc_segment_dedup,
    )

    base = " ".join(f"u{i}v{(i * 11) % 23}" for i in range(150))
    other = " ".join(f"m{i}n{(i * 5) % 17}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id bigint, text string"
    )
    for bh in ("md5", "xxhash64"):
        got = {
            r["doc_id"]: r
            for r in cdc_segment_dedup(docs, boundary_hash=bh).collect()
        }
        for doc_id, text in ((1, base), (2, other)):
            assert got[doc_id]["n_kept"] == got[doc_id]["n_segs"], bh
            assert got[doc_id]["deduped_text"].split(" ") == text.split(" "), bh
    # shift-robust dedup also holds under the fast hash
    pair = spark.createDataFrame(
        [(1, base), (2, "zzz " + base)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r
        for r in cdc_segment_dedup(pair, boundary_hash="xxhash64").collect()
    }
    assert got[2]["n_kept"] < got[2]["n_segs"]


def test_fd_audit_majority_and_violations(spark):
    """dq4 semantics: majority ties break on the LOWER rhs value, and
    n_violations is the repair distance (rows outside the majority)."""
    from enriched_crime_incident_data_pipeline_spark.operators.health import (
        fd_audit,
    )

    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"),          # majority x, 1 repair
        ("b", "p"), ("b", "q"),                       # tie -> lower 'p'
        ("c", "z"),                                   # clean FD
    ]
    df = spark.createDataFrame(rows, "lhs string, rhs string")
    got = {r["lhs"]: tuple(r)[1:] for r in fd_audit(df, "lhs", "rhs").collect()}
    assert got == {
        "a": (3, 2, "x", 1),
        "b": (2, 2, "p", 1),
        "c": (1, 1, "z", 0),
    }


def test_decayed_counts_bitexact_any_partitioning(spark):
    """ts7's exactness claim: every weight is a negative power of two
    and partial sums are multiples of 2^-30 below 2^53, so the plain
    unordered float sum is BIT-equal to the Python model under any
    physical partitioning."""
    import datetime as dt

    import pyspark.sql.functions as F

    base = dt.datetime(2026, 1, 31)
    rows = [
        (i, base - dt.timedelta(days=i % 45), f"t{i % 3}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp, tp string")
    now = max(r[1] for r in rows)
    want: dict = {}
    for _, ts, tp in rows:
        b = min((now.date() - ts.date()).days, 30)
        want[tp] = want.get(tp, 0.0) + 2.0 ** -b
    wts = F.array(*[F.lit(2.0 ** -b) for b in range(31)])
    for parts in (1, 7):
        aged = df.repartition(parts).crossJoin(
            F.broadcast(df.agg(F.max("ts").alias("_now")))
        ).select(
            "tp",
            F.element_at(
                wts,
                F.least(
                    F.datediff(F.to_date("_now"), F.to_date("ts")), F.lit(30)
                ) + 1,
            ).alias("_w"),
        )
        got = {
            r["tp"]: r["d"]
            for r in aged.groupBy("tp").agg(F.sum("_w").alias("d")).collect()
        }
        assert got == want  # == on floats: BIT equality, not approx


def test_source_minhash_mergeability(spark):
    """dd21's foundation: a source-level signature (element-wise min
    over its docs) equals the signature of the UNION of the shingle
    sets. sD splits sA's text so that its two docs' 3-shingle sets
    union to exactly sA's set ({abc,bcd} ∪ {cde,def} = {abc..def}),
    so sA and sD must match on all 16 coordinates (jaccard_bp =
    10000); a disjoint-vocabulary source must not."""
    import pyspark.sql.functions as F

    from enriched_crime_incident_data_pipeline_spark.registry.dedup import (
        q_dd21_source_overlap,
    )

    rows = [
        (1, "a b c d e f", "x", "sA"),
        (2, "a b c d", "x", "sD"),
        (3, "c d e f", "x", "sD"),
        (4, "q r s t u v", "x", "sZ"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="dd21_test_")
    docs.select("doc_id", "text", "lang", "source").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): (r["n_matches"], r["jaccard_bp"])
        for r in q_dd21_source_overlap(spark, d).collect()
    }
    assert out[("sA", "sD")] == (16, 10000)
    assert out[("sA", "sZ")][0] < 16
    assert out[("sD", "sZ")][0] == out[("sA", "sZ")][0]


def test_dq8_benford_digit_extraction_fixture(spark):
    """The cents quantization + decimal-string leading digit: scale
    invariance (0.05 / 5.0 / 50.0 all land on digit 5), sub-cent
    amounts (floor to 0) are excluded, and shares/deviations are
    integer basis points against the fixed Benford table."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    prices = [0.05, 5.0, 50.0, 123.45, 19.99, 0.001]  # last one drops
    rows = [(i, p) for i, p in enumerate(prices)]
    li = spark.createDataFrame(
        rows, "l_orderkey bigint, l_extendedprice double"
    )
    d = tempfile.mkdtemp()
    li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {
        r["digit"]: (r["n"], r["share_bp"], r["benford_bp"], r["abs_dev_bp"])
        for r in spark_queries()["dq8_benford"](spark, d).collect()
    }
    # 5 kept rows: digits 5,5,5,1,1
    assert got == {
        5: (3, 3 * 10000 // 5, 791, abs(6000 - 791)),
        1: (2, 2 * 10000 // 5, 3010, abs(4000 - 3010)),
    }


def test_dd22_ari_hand_cases(spark):
    """ARI in exact integer bp: identical partitions give exactly
    10000; an anti-aligned labeling gives the Fraction-model value
    (negative, sign-safe division). Exact-duplicate texts guarantee
    the LSH clustering used as side A."""
    import os
    import tempfile
    from fractions import Fraction

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    def run(sources):
        texts = ["alpha beta gamma delta epsilon zeta " * 4,
                 "one two three four five six seven eight " * 4,
                 "red green blue yellow purple orange pink " * 4]
        rows = [
            (i, texts[i // 2], "en", sources[i], 100)
            for i in range(6)
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string,"
            " source string, n_chars bigint",
        )
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        (r,) = spark_queries()["dd22_cluster_agreement"](spark, d).collect()
        return r

    # perfect agreement: same-text pairs share a source
    r = run(["s1", "s1", "s2", "s2", "s3", "s3"])
    assert (r["index_pairs"], r["sum_a_pairs"], r["sum_b_pairs"]) == (3, 3, 3)
    assert r["ari_bp"] == 10000

    # anti-aligned: every cluster splits 1/1 across two sources
    r = run(["s1", "s2", "s1", "s2", "s1", "s2"])
    cn2, index, sa, sb = Fraction(15), Fraction(0), Fraction(3), Fraction(6)
    ari = (index - sa * sb / cn2) / ((sa + sb) / 2 - sa * sb / cn2)
    assert ari < 0
    # sign-safe integer division of the scaled rational
    num2, den2 = 2 * (cn2 * index - sa * sb), cn2 * (sa + sb) - 2 * sa * sb
    want = -((-num2 * 10000) // den2)
    assert r["ari_bp"] == want == -3636


def test_dd23_sweep_is_monotone_and_consistent(spark):
    """Structural invariants of the threshold sweep: pair counts and
    docs_affected are non-increasing in the threshold, the loosest
    point equals the raw dd7-style pair relation's size, and
    docs_affected never exceeds 2x pairs."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        embedding_near_dup_pairs,
    )
    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.sources.catalog import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        (r["threshold_bp"], r["n_pairs"], r["docs_affected"])
        for r in spark_queries()["dd23_threshold_sweep"](spark, sf).collect()
    )
    assert [t for t, _, _ in rows] == [2000, 3000, 4000, 5000, 7000]
    for (t1, p1, d1), (t2, p2, d2) in zip(rows, rows[1:]):
        assert p1 >= p2 and d1 >= d2
    for _, p, d in rows:
        assert d <= 2 * p
    emb = load_table(spark, sf, "embeddings")
    base = embedding_near_dup_pairs(
        emb, threshold=0.2, block_clusters=16
    ).count()
    assert rows[0][1] == base > 0


def test_dq9_reconciliation_hand_fixture(spark):
    """Reconciliation classes pinned: an exactly-matching header, a
    header 3 cents off, and a header with no lines — and the cents
    quantization is per-LINE-then-sum (two 0.005 halves floor to 0
    each, so the header's floor(1 cent) reads as a 1-cent drift:
    the audit defines its quantization, the fixture documents it)."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    # NB 10.03*100 is 1002.999... in IEEE doubles, so the header
    # floors to 1002 cents — deterministic and identical in both
    # engines, and exactly why the audit pins floor() semantics
    orders = [(1, 20.00), (2, 10.03), (3, 5.00), (4, 0.01)]
    lines = [
        (1, 1, 12.00), (1, 2, 8.00),     # exact
        (2, 1, 10.00),                    # 3 cents off
        # order 3: no lines
        (4, 1, 0.005), (4, 2, 0.005),     # floors: 0+0 vs header 1
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_totalprice double"
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey bigint, l_linenumber int, l_extendedprice double"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    (r,) = spark_queries()["dq9_reconciliation"](spark, d).collect()
    assert (
        r["n_orders"], r["n_no_lines"], r["n_exact"], r["n_mismatched"],
        r["max_abs_diff_cents"], r["total_abs_diff_cents"],
    ) == (4, 1, 1, 2, 2, 3)


def test_dq10_schema_drift_added_key_and_type_flip_fixture(spark):
    """Hand fixture for the snapshot-diff semantics: 10 hourly events,
    midpoint cut puts the first 5 in T1. Key 'k' stays int (stable,
    zero drift); key 'm' is int in T1 and splits 5 int / 5 string at
    T2 — the tie resolves by the pinned count-desc-name-DESC rule to
    'string', so the flip ALSO pins the json2 tie rule; key 'newk'
    appears only after the cut (added, dominant NULL at T1,
    presence 0 → 5000 bp)."""
    import datetime
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(10):
        ts = t0 + datetime.timedelta(hours=i)
        if i < 5:
            props = '{"k": %d, "m": %d}' % (i, i)
        else:
            props = '{"k": %d, "m": "x", "newk": true}' % i
        rows.append((i, ts, props))
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp, props string")
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["key"]: (
            r["status"],
            r["n_t1"],
            r["n_t2"],
            r["dominant_t1"],
            r["dominant_t2"],
            r["presence_drift_bp"],
        )
        for r in spark_queries()["dq10_schema_drift"](spark, d).collect()
    }
    assert got == {
        "k": ("stable", 5, 10, "int", "int", 0),
        "m": ("type_flip", 5, 10, "int", "string", 0),
        "newk": ("added", 0, 5, None, "bool", 5000),
    }


def test_dq12_event_order_audit_injected_lateness(spark):
    """Hand fixture for the ordering-audit semantics (the testdata
    feed is fully ordered — n_late 0 at every SF, the negative result
    that VALIDATES st7/st28's ordering contract there — so the
    non-degenerate path is pinned here): user 1 appends an event 90 s
    behind its running max and then one more in order; user 2 stays
    ordered; ties (equal ts) are NOT late (strict <)."""
    import datetime
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # user 1: 0s, 100s, then LATE at 10s (90s behind rm=100),
        # then 100s again (tie with running max -> not late)
        (1, 1, ts(0)),
        (2, 1, ts(100)),
        (3, 1, ts(10)),
        (4, 1, ts(100)),
        # user 2: ordered
        (5, 2, ts(0)),
        (6, 2, ts(50)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp"
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    (r,) = spark_queries()["dq12_event_order_audit"](spark, d).collect()
    assert (
        r["n_events"],
        r["n_late"],
        r["late_share_bp"],
        r["max_lateness_s"],
        r["n_users_affected"],
    ) == (6, 1, 1666, 90, 1)


def test_dq13_column_profile_injected_nulls(spark):
    """Hand fixture pinning the null path (the shipped events table
    has no nulls, so tri-SF exactness alone would never exercise
    null_bp > 0): 4 rows, props null in 2 (5000 bp), value null in 1
    (2500 bp), distinct counts ignore nulls."""
    import datetime
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        (1, t0, 10, "a", 1.5, '{"k":1}'),
        (2, t0, 10, "b", None, None),
        (3, t0, 11, "a", 2.5, '{"k":2}'),
        (4, t0, 12, "b", 2.5, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["col_name"]: (r["n_null"], r["null_bp"], r["n_distinct"])
        for r in spark_queries()["dq13_column_profile"](spark, d).collect()
    }
    assert got == {
        "event_id": (0, 0, 4),
        "ts": (0, 0, 1),
        "user_id": (0, 0, 3),
        "event_type": (0, 0, 2),
        "value": (1, 2500, 2),
        "props": (2, 5000, 2),
    }


def test_dq14_key_uniqueness_null_composite_keys(spark):
    """Hand fixture pinning dq14's null-key semantics (r10 advisor:
    the shipped tables have no null keys, so tri-SF exactness cannot
    see a null/distinct divergence): n_keys counts distinct key
    tuples among rows with NO null key field; dup_key_rows counts
    duplicates among those non-null-keyed rows only; null-keyed rows
    land solely in null_key_rows.  lineitem gets the pathological
    composite-key input a PK audit exists to catch — nulls in either
    field, a repeated (null, null), and a genuine dup."""
    import os
    import tempfile

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )
    from enriched_crime_incident_data_pipeline_spark.registry.quality import (
        _PK_SPEC,
    )

    d = tempfile.mkdtemp()
    # minimal single-row tables for the 9 simple-key tables (column
    # pruning means only the key column needs to exist on disk)
    for t, keys in _PK_SPEC:
        if t == "lineitem":
            continue
        # events additionally needs ts on disk: load_table normalizes
        # its timestamp precision at load, before column pruning
        schema = f"{keys[0]} bigint" + (
            ", ts timestamp" if t == "events" else ""
        )
        row = (1, None) if t == "events" else (1,)
        spark.createDataFrame([row], schema).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    li = [
        (1, 1),  # unique
        (1, 2),  # unique
        (2, 1),
        (2, 1),  # dup of (2, 1) — the one real duplicate pair
        (None, 1),  # null first field
        (3, None),  # null second field
        (None, None),
        (None, None),  # repeated all-null tuple: NOT a dup, NOT a key
    ]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_linenumber bigint"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))

    got = {
        r["table_name"]: (
            r["n_rows"],
            r["n_keys"],
            r["dup_key_rows"],
            r["null_key_rows"],
        )
        for r in spark_queries()["dq14_key_uniqueness"](spark, d).collect()
    }
    # 8 rows; 4 null-keyed; 3 distinct non-null tuples; 1 dup row
    assert got["lineitem"] == (8, 3, 1, 4)
    assert got["region"] == (1, 1, 0, 0)
    # the DuckDB oracle agrees on the same fixture (this is exactly
    # the input the r9 advisor showed diverging pre-fix)
    import duckdb

    from enriched_crime_incident_data_pipeline_spark.registry.quality import (
        _dq14_oracle_sql,
    )

    con = duckdb.connect()
    for t, _ in _PK_SPEC:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, t)}.parquet/*.parquet')"
        )
    ora = {
        r[0]: tuple(r[1:])
        for r in con.execute(_dq14_oracle_sql()).fetchall()
    }
    assert ora == got


def test_pin_mode_persist_matches_local(spark, monkeypatch):
    """r11 (verdict item 9): SPARK_GRAFT_PIN_MODE=persist swaps the
    lineage-truncating localCheckpoint pin for a lineage-preserving
    persist(DISK_ONLY) — cluster deployments that cannot accept
    job-level retry on executor loss opt in; results are identical."""
    from pyspark import StorageLevel

    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        _pin,
        lsh_candidate_pairs,
        minhash_bands,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "an entirely different document about spark joins"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    local_pairs = sorted(
        tuple(r) for r in lsh_candidate_pairs(minhash_bands(docs)).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "persist")
    pinned = _pin(docs)
    assert pinned.storageLevel == StorageLevel.DISK_ONLY
    persist_pairs = sorted(
        tuple(r) for r in lsh_candidate_pairs(minhash_bands(docs)).collect()
    )
    pinned.unpersist()
    assert persist_pairs == local_pairs
    assert local_pairs == [(1, 2)]
