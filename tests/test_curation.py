"""corpus_curation_run fixture tests: a 6-doc hand corpus exercising
every verdict tier at once (the shipped tables exercise the tiers at
volume; this pins the PRECEDENCE and the per-tier mechanics on rows
small enough to reason about by hand)."""

import os
import tempfile

from enriched_crime_incident_data_pipeline_spark.registry import spark_queries


def _fixture_dir(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " changed"
    evaltext = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    )
    contam = (
        "prefix words here then alpha bravo charlie delta echo foxtrot"
        " golf hotel more tail"
    )
    clean = (
        "completely different content about weather reports and maritime"
        " forecasts today"
    )
    rows = [
        (1, "srcA", base),  # keeper: of the exact pair AND the near-dup family
        (2, "srcA", base),  # exact dup of 1 (identical fingerprint)
        (3, "srcB", near),  # near dup of 1 (one trailing token changed)
        (50, "srcB", evaltext),  # eval split (50 % 50 == 0)
        (4, "srcC", contam),  # shares an 8-gram with the eval doc
        (5, "srcC", clean),  # survives every tier
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_curation_run_verdict_tiers_and_report_cells(spark):
    d = _fixture_dir(spark)
    out = spark_queries()["corpus_curation_run"](spark, d).collect()
    got = {(r["metric"], r["dim"]): r["value"] for r in out}
    assert got[("docs", "exact_dup")] == 1  # doc 2
    assert got[("docs", "near_dup")] == 1  # doc 3 (keeper: tie -> min id 1)
    assert got[("docs", "eval_holdout")] == 1  # doc 50
    assert got[("docs", "contaminated")] == 1  # doc 4
    assert got[("docs", "kept")] == 2  # docs 1, 5
    # the near-dup family {1, 3} is one size-2 family
    assert got[("dup_family_size", "2")] == 1
    # contamination attributed to doc 4's provider
    assert got[("contaminated_by_source", "srcC")] == 1
    # kept corpus: 60 (doc 1) + 10 (doc 5) tokens -> one 256 pack
    assert got[("kept_tokens", "")] == 70
    assert got[("n_packs", "")] == 1
    assert got[("docs_crossing", "")] == 0
    assert got[("pack_crossing_bp", "")] == 0


def test_curation_run_precedence_exact_beats_eval(spark):
    """An eval-split doc that is also an exact duplicate reports as
    exact_dup (precedence exact > near-dup > eval > contaminated),
    while its grams STILL enter the eval reference set — the
    reference set is defined on the original corpus, not on
    survivors."""
    txt = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        # tier-1 keeper (min id) of the exact pair — but identical to
        # the eval doc's text, so it is then CONTAMINATED: the eval
        # reference set comes from the original corpus even when the
        # eval doc itself was dropped as a duplicate
        (1, "srcA", txt),
        (50, "srcA", txt),  # eval doc, exact dup of 1 -> verdict exact_dup
        # embeds doc 50's 8-gram in otherwise-unrelated text (too few
        # shared shingles to LSH-collide) -> contaminated
        (
            2,
            "srcB",
            "one two three four five six seven eight alpha bravo charlie"
            " delta echo foxtrot golf hotel nine ten eleven twelve"
            " thirteen fourteen",
        ),
        (3, "srcB", "unrelated clean words entirely separate content"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = spark_queries()["corpus_curation_run"](spark, d).collect()
    got = {(r["metric"], r["dim"]): r["value"] for r in out}
    assert got[("docs", "exact_dup")] == 1  # doc 50, not eval_holdout
    assert got.get(("docs", "eval_holdout"), 0) == 0
    assert got[("docs", "contaminated")] == 2  # docs 1 and 2
    assert got[("contaminated_by_source", "srcA")] == 1
    assert got[("contaminated_by_source", "srcB")] == 1
    assert got[("docs", "kept")] == 1  # doc 3
    assert got[("kept_tokens", "")] == 6
