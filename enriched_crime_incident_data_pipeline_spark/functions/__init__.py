"""Column-function library: pure ``Column -> Column`` builders.

Everything here is built-in ``pyspark.sql.functions`` composition —
JVM-side, whole-stage-codegen'd, no Python UDFs — so Catalyst can fold,
push down, and vectorize freely.
"""

from enriched_crime_incident_data_pipeline_spark.functions.geography import (
    bearing_degrees,
    compass_bucket,
    compass_bucket_half_even,
    side_of_town_col,
)
from enriched_crime_incident_data_pipeline_spark.functions.datetime_fns import (
    day_of_week,
    hour_of_day,
    parse_incident_ts,
    url_report_date,
)
from enriched_crime_incident_data_pipeline_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id,
    normalize_text,
    quality_features,
    token_count,
    word_shingles,
    tokens,
)
from enriched_crime_incident_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "bearing_degrees",
    "compass_bucket",
    "compass_bucket_half_even",
    "side_of_town_col",
    "day_of_week",
    "hour_of_day",
    "parse_incident_ts",
    "url_report_date",
    "char_ngrams",
    "doc_fingerprint",
    "lang_id",
    "normalize_text",
    "quality_features",
    "token_count",
    "word_shingles",
    "tokens",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
