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
    assert len(queries) >= 314  # r8 floor; raise as the registry grows
    assert all(callable(v) for v in queries.values())
    # every oracle refers to a registered query
    assert set(oracle_queries()) <= set(queries)
