"""Query + oracle registry, split per family (r6; was one 10.8 kLoC
module). Each family module holds its query functions with their
oracle SQL adjacent; this package assembles the driver-contract
dicts and re-exports the public surface of the old registry.py.
"""

from __future__ import annotations

from enriched_crime_incident_data_pipeline_spark.registry._shared import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry._shared import (  # noqa: F401
    QueryFn,
    MIXTURE_TARGETS_BP,
)
from enriched_crime_incident_data_pipeline_spark.registry.analytics import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.corpus import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.crime import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.curation import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.decontaminate import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.dedup import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.graph import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.multimodal import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.quality import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.scale import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.similarity import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.sketch import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.stats import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.streaming import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.temporal import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.text import *  # noqa: F401,F403
from enriched_crime_incident_data_pipeline_spark.registry.tpch import *  # noqa: F401,F403

from enriched_crime_incident_data_pipeline_spark.registry import (
    analytics as _analytics,
    corpus as _corpus,
    crime as _crime,
    curation as _curation,
    decontaminate as _decontaminate,
    dedup as _dedup,
    graph as _graph,
    multimodal as _multimodal,
    quality as _quality,
    scale as _scale,
    similarity as _similarity,
    sketch as _sketch,
    stats as _stats,
    streaming as _streaming,
    temporal as _temporal,
    text as _text,
    tpch as _tpch,
)

_FAMILIES = [_analytics, _corpus, _crime, _curation, _decontaminate, _dedup, _graph, _multimodal, _quality, _scale, _similarity, _sketch, _stats, _streaming, _temporal, _text, _tpch]


def spark_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for _m in _FAMILIES:
        dup = set(out) & set(_m.QUERIES)
        assert not dup, f"duplicate query names across families: {dup}"
        out.update(_m.QUERIES)
    return out


def oracle_queries() -> dict[str, str]:
    out: dict[str, str] = {}
    for _m in _FAMILIES:
        out.update(_m.oracles())
    return out
