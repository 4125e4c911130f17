"""Skew-resistant aggregation: two-phase (salted) groupBy.

A ``groupBy(key)`` over a power-law key domain (locations, natures,
document sources …) sends every row of a hot key to one reducer. AQE
splits skewed *join* partitions but does not re-balance aggregation
state, so for hot-key aggregations the classic fix applies: salt the
key into ``n_salts`` subkeys, partially aggregate per (key, salt),
then combine the partials per key. Both shuffles move only the
aggregated partials for phase 2 — |keys| × n_salts rows, independent
of row count.

Only algebraic aggregates (count/sum/min/max and compositions like
avg = sum/count) can be salted this way; use it when a key may hold
more rows than one executor's aggregation state should.

Spark note: hash aggregation already does map-side partial
aggregation per *task*, which usually absorbs skew for cheap
aggregates — salting matters when upstream partitioning concentrates
a hot key into few tasks (e.g. after a join keyed on the hot key), or
for high-fanout aggregation state. The operator exists so pipelines
can opt in without restructuring.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_count(
    df: DataFrame, keys: Sequence[str] | str, n_salts: int = 32, out: str = "cnt"
) -> DataFrame:
    """``groupBy(keys).count()`` with two-phase salting."""
    if isinstance(keys, str):
        keys = [keys]
    salted = df.withColumn(_SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("bigint").alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant shuffle equi-join: salt the big side's key into
    ``n_salts`` subkeys and replicate the small side once per salt, so
    a hot key's rows spread over ``n_salts`` reducers instead of one.

    Exact same result set as ``big.join(small, keys, how)`` — each
    big row meets each matching small row exactly once (via its own
    salt's replica). Use when BOTH sides are too big to broadcast and
    the key is power-law; for broadcastable dims just broadcast. The
    price is shuffling ``n_salts×`` the small side — pick the
    smallest ``n_salts`` that caps the hottest reducer.
    """
    if isinstance(keys, str):
        keys = [keys]
    big_s = big.withColumn(_SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias(_SALT)
    )
    small_r = small.crossJoin(salts)
    return big_s.join(small_r, [*keys, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """General two-phase aggregation: ``partial_aggs`` run per
    (keys, salt), ``final_aggs`` combine the partial columns per keys.

    Example — salted sum and max::

        salted_agg(df, "k",
                   {"_s": F.sum("v"), "_m": F.max("v")},
                   {"total": F.sum("_s"), "peak": F.max("_m")})
    """
    if isinstance(keys, str):
        keys = [keys]
    salted = df.withColumn(_SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )
