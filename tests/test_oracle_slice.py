"""Rotating oracle-verification slice (round-3 verdict item 7: the
judge's spot-check loop, promoted to CI).

Each round, 25 registry queries — chosen deterministically by
rotating the sorted query list by 25 × round-index (round-index =
number of ``BENCH_r*.json`` files at the repo root, which grows by
one per driver round) — are run on Spark AND their DuckDB oracle at
sf0.001, compared with the same canonicalization the driver uses
(``selfcheck.frame_rows`` / ``values_match``). Every registry query
therefore gets locally oracle-verified every ceil(N/25) ≈ 8 rounds
without a full-registry run per push.

Run just this gate with ``pytest -m oracle_slice``; slice selection
is reproducible (pure function of the checked-in file set).
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import selfcheck  # noqa: E402  (repo-root module)
import __spark_entry__ as entry_mod  # noqa: E402

SLICE = 40
SF_DIR = "/root/testdata/sf0.001"

# r10 verdict item 4: the driver's per-round sample has drawn ZERO §2
# crime-core queries in 9 rounds (they sort early and the rotation
# period at 334 queries is ~13 rounds) — local gates are their only
# oracle coverage, so the §2 parity set is pinned ALWAYS-ON here and
# the rotation covers the remainder.
PINNED_S2 = [
    "flagship_enriched_report",
    "p1_projection",
    "p2_star",
    "p3_point_lookup",
    "p4_null_health",
    "p6_url_classify",
    "s2_watermark_prune",
    "s5_pdf_parse",
    "s5b_pdf_decode",
    "s6_idempotent_append",
    "j1_broadcast_join",
    "j2_emsstat_selfjoin",
    "j3_cache_antijoin",
    "j4_rank_joinback",
    "j5_weather_joinback",
    "j7_anti_join",
    "a1_groupby_count",
    "a3_watermark_max",
    "a4_global_count",
    "a6_distinct_single",
    "a7_distinct_multi",
    "w1_frequency_rank",
    "w3_window_max",
    "f1_derivations",
    "f5_date_format",
    "f13_side_of_town",
    "f15_element_at",
]


def _round_index() -> int:
    return len(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))


def _slice_names() -> list[str]:
    pinned = set(PINNED_S2)
    names = sorted(n for n in entry_mod.queries() if n not in pinned)
    k = (_round_index() * SLICE) % len(names)
    rotated = names[k:] + names[:k]
    return PINNED_S2 + rotated[:SLICE]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _check_one(spark, con, name: str, sf_dir: str) -> None:
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    scols, srows = selfcheck.frame_rows(
        sdf.columns, [tuple(r) for r in sdf.collect()]
    )
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops, like the driver
        assert srows is not None
        return
    cur = con.execute(oracles[name])
    ocols, orows = selfcheck.frame_rows(
        [d[0] for d in cur.description], cur.fetchall()
    )
    assert scols == ocols, f"{name}: columns {scols} vs {ocols}"
    ok, note = selfcheck.values_match(srows, orows)
    assert ok, f"{name}: {note}"


@pytest.mark.oracle_slice
@pytest.mark.parametrize("name", _slice_names())
def test_oracle_slice(spark, duck, name):
    _check_one(spark, duck, name, SF_DIR)


# ---- sf0.1 heavy-query slice (round-5 verdict item 8) ----
# Scale-dependent divergence (integer overflow, float accumulation
# drift, skew-path differences) only shows where data is biggest, so
# a rotating 10-query slice of the HEAVY (bench longtail) queries
# also runs against the sf0.1 oracle each round.

SLICE_SF01 = 10
SF01_DIR = "/root/testdata/sf0.1"


def _heavy_slice_names() -> list[str]:
    import bench  # repo-root module; LONGTAIL = the measured heavy set

    names = sorted(n for n in bench.LONGTAIL if n in entry_mod.queries())
    k = (_round_index() * SLICE_SF01) % len(names)
    rotated = names[k:] + names[:k]
    return rotated[:SLICE_SF01]


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.oracle_slice
@pytest.mark.parametrize("name", _heavy_slice_names())
def test_oracle_slice_sf01(spark, duck_sf01, name):
    _check_one(spark, duck_sf01, name, SF01_DIR)


# ---- sf1 heavy-NUMERIC slice (round-6, r5 verdict item 6) ----
# Overflow and float-accumulation divergence shows up with scale that
# even sf0.1 doesn't reach. A rotating 6-query slice of the heaviest
# NUMERIC operators (sketches, tokenizers, graph counts, EWMA,
# prefix-sum packing) runs against a DuckDB oracle at sf1 — the
# derived 10×-sf0.1 dataset (tools/make_sf1.py, deterministic, no
# RNG), generated once into /tmp and reused across runs. Runtime is
# bounded: 6 queries ≈ 1.5–2.5 min including the one-time derivation.

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
SLICE_SF1 = 6
SF1_POOL = [
    "sk8_heavy_hitters",
    "dd17_cdc_segments",
    "tok5_bpe_char_merges",
    "gr4_triangles",
    "ts6_ewma",
    "tp14_domain_upsample",
    "sk7_quantile_sketch",
    "tok7_fertility_audit",
    "dd1_exact_dedup",
    "tp1_pack",
    "tok8_compression_curve",
    "dd21_source_overlap",
    "ts7_decayed_counts",
    "dq5_ri_audit",
    # r7 session-3 joiners (measured sf1 oracle costs 0.01–3.5 s):
    "stat6_linear_trend",
    "ts9_max_concurrency",
    "dq8_benford",
    "dq9_reconciliation",
    "tp16_mixture_curve",
    "seq3_collocations",
    "asof6_window_agg",
    # r8 joiners (measured sf1 DuckDB oracle costs, 2026-08-16):
    "stat7_lorenz_curve",  # 0.02 s
    "ss19_quant_bits_curve",  # 0.24 s
    "cdc2_snapshot_diff",  # 0.30 s
    "dq10_schema_drift",  # 1.23 s
    "json2_schema_profile",  # 1.48 s
    "ret7_phrase_search",  # 5.48 s
    "er3_cluster_cohesion",  # 7.61 s — r7 verdict ask; worth the seconds
    # r8 second wave (measured sf1 DuckDB oracle costs, 2026-08-16):
    "st31_incident_feed_source",  # 0.01 s
    "st30_stream_gap_monitor",  # 0.07 s
    "ts10_gap_histogram",  # 0.12 s
    "ss20_ivf_balance",  # 0.57 s
    "st29_stream_schema_drift",  # 1.15 s
    "tok11_coverage_curve",  # 1.68 s
    "sk10_bloom_fpr_curve",  # 2.02 s
    "ta15_heaps_curve",  # 2.07 s
    "er4_deletion_blocking",  # 2.77 s
    # r9 joiners (measured sf1 DuckDB oracle costs, 2026-08-16):
    "dq11_k_anonymity",  # 0.00 s
    "seq4_session_paths",  # 0.46 s
    "tok12_vocab_drift",  # 1.52 s
    "st32_stream_k_anonymity",  # 0.00 s (dq11's oracle)
    "dq12_event_order_audit",  # 0.10 s
    "tp17_truncation_loss",  # 2.08 s
    "ret8_self_retrieval_mrr",  # 3.40 s
    "ts11_seasonality_profile",  # 0.06 s
    "st33_stream_order_audit",  # 0.10 s (dq12's oracle)
    "sk11_cms_width_curve",  # 0.14 s
    "ss21_dim_stats",  # 0.12 s
    "dq13_column_profile",  # 0.07 s
    "tp18_fragmentation_report",  # 2.06 s
    "mm8_exact_media_dedup",  # 0.10 s
    "dq14_key_uniqueness",  # 0.20 s
    "ta16_zipf_profile",  # 1.46 s
    "ol2_iqr_outliers",  # 0.31 s
    "dc9_contamination_by_source",  # 2.60 s
    # r10 joiners (measured sf1 DuckDB oracle costs, 2026-08-16):
    "tp19_pack_budget_curve",  # 2.62 s
    "sk12_hll_precision_curve",  # 0.54 s
    "ts12_autocorr_profile",  # 0.06 s
    "ol3_grouped_mad_outliers",  # 0.18 s
    "mm9_payload_size_profile",  # 0.05 s
    "dq15_fk_fanout_profile",  # 0.15 s
    "dc10_gram_length_curve",  # 3.23 s
    "ts13_burstiness_profile",  # 0.02 s
    "ret9_postings_skew_profile",  # 3.07 s
    "tok13_piece_length_profile",  # 4.68 s
    "er5_block_size_profile",  # 0.02 s
    # r10 third wave (measured sf1 DuckDB oracle costs, 2026-08-16):
    "ts14_changepoint_profile",  # 0.22 s
    "ss22_norm_profile",  # 0.14 s
    # r10 fourth wave (measured sf1 DuckDB oracle costs, 2026-08-16):
    "sk13_cms_depth_curve",  # 0.10 s
    "geo3_grid_density_profile",  # 0.01 s
    "er6_distance_threshold_curve",  # 0.98 s
    "ol4_gate_agreement",  # 0.17 s
    "sj3_salt_factor_curve",  # 0.03 s
    "tp20_fragmentation_by_source",  # 2.41 s
    "dc11_bloom_exact_agreement",  # 4.79 s
]
# deliberately NOT in the pool (measured r6): gr3_hits (207 s — the
# unrolled-HITS DuckDB oracle over the sf1 banding is itself the
# cost), wa3_range_frame (43 s oracle window), gr6_kcore (109 s —
# 8 MATERIALIZED peel rounds over the sf1 bands) and
# dd20_dup_rate_by_source (346 s — DuckDB's recursive-CTE CC at sf1)
# — their sf1 behavior is covered by SCALING.md sweeps; this slice
# stays ≤ ~2 min. r8 measurements add two more exclusions:
# gr12_reciprocity (17.7 s — the mutual-edge join over sf1's edge
# list) and mm6_phash_threshold_curve (396 s — DuckDB evaluates the
# 4-threshold Hamming sweep as repeated un-indexed band joins).
# r9 measurement: gr14_two_hop_reach excluded at 16.2 s (the
# un-indexed wedge self-join over sf1's symmetric edge list — same
# class as gr12); its sf1 behavior rides the SCALING sweeps.
# gr15_wedge_skew_audit likewise excluded at 15.4 s (same edge CTE).
# dd25_cluster_size_histogram excluded at 359.7 s (DuckDB's
# recursive-CTE connected components at sf1 — dd20's standing
# exclusion class).
# dd26_shingle_sensitivity excluded at 171.1 s (three un-indexed
# band self-joins at sf1; the sf1 VALUES are quoted in PLANS.md —
# w=2 over-pairs 4.3× vs w=3: 12,027 vs 2,781 candidates).
# r10 measurement: gr16_component_size_histogram excluded at a
# measured 97.1 s (the recursive-CTE CC over the sf1 citation edges,
# dd20's class); its sf1 behavior rides the CC components already in
# the pool and the SCALING sweeps.
# r10 measurement: dd27_jaccard_threshold_curve excluded (>200 s,
# killed at the cap — dd19's un-indexed band-join + shingle
# intersection class at sf1); its threshold cells are dd19's verified
# pairs, which ride the sf0.1 heavy slice.
# r10 measurement: corpus_curation_run excluded (>150 s, killed at
# the cap — its oracle embeds the recursive-CTE CC of dd25's 360 s
# class PLUS the full gram join); its sf1 behavior rides the
# component queries already in the pool/sweeps (dd1/tp1/tp18 here,
# dc9 at 2.6 s) and the SCALING sweeps.
# r10 sixth-wave measurement: mm10_dhash_band_skew excluded at
# 17.0 s (the per-byte dHash CTE chain at sf1 — mm6's 396 s class,
# lighter because no pair join follows); rides the sf0.1 slice.
# r10 third-wave measurements: dd28_sig_length_curve excluded at
# 19.8 s (dd16's un-indexed band join + shingle intersection at
# sf1), gr17_transitivity at 20.1 s (the triangle two-join over
# sf1's band-derived edge list, gr12/gr14's class),
# ta17_filter_attribution at 12.7 s (the per-doc stopword
# list_filter over sf1's 5M docs — ta7's oracle class). All three
# ride the sf0.1 slice and the SCALING sweeps.


def _sf1_slice_names() -> list[str]:
    names = [n for n in SF1_POOL if n in entry_mod.queries()]
    k = (_round_index() * SLICE_SF1) % len(names)
    rotated = names[k:] + names[:k]
    return rotated[:SLICE_SF1]


@pytest.fixture(scope="module")
def duck_sf1():
    import duckdb

    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        # one-time derivation (~30 s); reused by later runs and by
        # tools/scaling_sweep.py
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "make_sf1.py"),
             SF1_DIR],
            check=True,
            capture_output=True,
        )
    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF1_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.oracle_slice
@pytest.mark.parametrize("name", _sf1_slice_names())
def test_oracle_slice_sf1(spark, duck_sf1, name):
    _check_one(spark, duck_sf1, name, SF1_DIR)
