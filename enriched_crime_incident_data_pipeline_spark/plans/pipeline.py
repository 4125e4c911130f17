"""End-to-end pipeline plan (reference §3.1, re-expressed as one
declarative DataFrame DAG).

Reference control flow (src/pipeline/main.py:48-122): scrape → fetch →
parse → insert+EMSSTAT → ranks → geocode → weather → side_of_town →
health. Every UPDATE-in-place stage becomes a pure transformation;
Catalyst plans the whole DAG at once (broadcast dims, pushdown,
partial aggregation) instead of N round-trips to an external SQL
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
    dedup_by_key,
    idempotent_append,
)
from enriched_crime_incident_data_pipeline_spark.operators.derive import to_silver
from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
    propagate_emsstat,
)
from enriched_crime_incident_data_pipeline_spark.operators.ranks import (
    with_frequency_rank,
)
from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.enrich.sides import (
    with_side_of_town,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import with_weather
from enriched_crime_incident_data_pipeline_spark.sinks.output import gold_projection


def enrich_incidents(
    silver: DataFrame,
    location_cache: DataFrame,
    weather_hourly: DataFrame,
) -> DataFrame:
    """silver (typed, deduped) → fully-enriched incidents.

    Stage order mirrors §3.1 but is one lazy DAG:
    emsstat window-max → frequency ranks (location, nature) →
    coordinates (broadcast dim join) → side_of_town (column math) →
    weather (broadcast hourly-lookup join)."""
    return enrich_after_emsstat(
        propagate_emsstat(silver), location_cache, weather_hourly
    )


def enrich_after_emsstat(
    base: DataFrame,
    location_cache: DataFrame,
    weather_hourly: DataFrame,
) -> DataFrame:
    """Enrichment tail for inputs whose EMSSTAT is already
    propagated (e.g. by the fused ``dedup_and_propagate``): ranks →
    coordinates → side_of_town → weather. Every join here is a
    broadcast — the fact side is never re-shuffled."""
    df = with_frequency_rank(base, "location", "location_rank")
    df = with_frequency_rank(df, "nature", "incident_rank")
    df = with_coordinates(df, location_cache)
    df = with_side_of_town(df)
    df = with_weather(df, weather_hourly)
    return df


def run_pipeline(
    bronze: DataFrame,
    existing: DataFrame | None,
    location_cache: DataFrame,
    weather_hourly: DataFrame,
) -> DataFrame:
    """Full batch: bronze rows → typed → idempotent-append set →
    enriched gold projection (9 columns + keys retained upstream)."""
    silver = to_silver(bronze)
    silver = (
        dedup_by_key(silver, "incident_num")
        if existing is None
        else idempotent_append(silver, existing, "incident_num")
    )
    enriched = enrich_incidents(silver, location_cache, weather_hourly)
    return gold_projection(enriched)
