"""Pre-flight canonicalization audit (VERDICT r2 item #8): the
driver's DuckDB compare sorts columns by name and hashes canonicalized
cell values — bare ARRAY/MAP/STRUCT output columns are where engines
diverge on ordering/rendering and where round-1's only red (mm1) came
from. Every registry query must therefore emit only scalar columns
(atomic types); complex values must be projected to a deterministic
scalar (JSON string, exploded rows, element_at, …) before return.

This enumerates ALL ``spark_queries()`` output schemas WITHOUT
executing them (plan-only: ``df.schema``), so the whole registry is
audited in one cheap pass.
"""

from __future__ import annotations

import pyspark.sql.types as T

from enriched_crime_incident_data_pipeline_spark import registry

SF_DIR = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_every_registry_query_emits_only_scalar_columns(spark):
    qs = registry.spark_queries()
    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, _COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries returning non-scalar columns (driver hash compare "
        f"cannot canonicalize them reliably): {offenders}"
    )


def test_registry_query_and_oracle_key_sets_align(spark):
    """Every oracle has a query; queries without an oracle are the
    documented non-SQL-expressible set only (streaming/stateful)."""
    qnames = set(registry.spark_queries())
    onames = set(registry.oracle_queries())
    assert onames <= qnames, sorted(onames - qnames)
