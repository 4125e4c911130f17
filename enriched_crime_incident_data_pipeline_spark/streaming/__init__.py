"""Structured Streaming surface.

The reference is strictly batch (`/root/reference/TECHNICAL.md:23`);
its only streaming-adjacent semantics is the high-watermark
incremental skip (`/root/reference/src/scrape/normanpd.py:23-27,43`).
This package is the idiomatic Spark upgrade path called out in
SURVEY.md §2.9: a file-source stream with `Trigger.AvailableNow` +
checkpointing replaces the hand-rolled MAX(ts) watermark, and
watermarked windowed aggregation / `applyInPandasWithState` cover the
late-data and custom-stateful cases a live incident feed would need.
"""

from enriched_crime_incident_data_pipeline_spark.streaming.source import (
    stream_events,
    stream_incidents_raw,
    stream_table,
)
from enriched_crime_incident_data_pipeline_spark.streaming.windows import (
    run_available_now,
    sliding_counts,
    tumbling_counts,
)
from enriched_crime_incident_data_pipeline_spark.streaming.sample import (  # noqa: F401
    finalize_weighted_sample,
    stream_weighted_sample,
)
from enriched_crime_incident_data_pipeline_spark.streaming.order_audit import (
    finalize_order_audit,
    stream_order_counters,
)
from enriched_crime_incident_data_pipeline_spark.streaming.kanon import (
    finalize_k_anonymity,
    stream_group_sizes,
)
from enriched_crime_incident_data_pipeline_spark.streaming.gaps import (
    finalize_gap_histogram,
    stream_gap_buckets,
)
from enriched_crime_incident_data_pipeline_spark.streaming.sessions import (
    session_counts_stateful,
)

__all__ = [
    "stream_events",
    "stream_incidents_raw",
    "stream_table",
    "tumbling_counts",
    "sliding_counts",
    "run_available_now",
    "session_counts_stateful",
    "stream_gap_buckets",
    "finalize_gap_histogram",
    "stream_group_sizes",
    "finalize_k_anonymity",
    "stream_order_counters",
    "finalize_order_audit",
]
