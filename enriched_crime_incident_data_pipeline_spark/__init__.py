"""PySpark-native analytics engine with the query and data-processing
capabilities of KothiyalAkshat99/Enriched-Crime-Incident-Data-Pipeline.

Brand-new, Spark-first design (DataFrame / SQL / Catalyst / Structured
Streaming). The reference (read-only snapshot at /root/reference)
delegates all relational work to PostgreSQL via embedded SQL strings;
this engine re-founds the same semantics on Spark:

- every UPDATE-in-place enrichment stage becomes a pure
  ``DataFrame -> DataFrame`` transformation (join / window / withColumn),
- ``ON CONFLICT DO NOTHING`` idempotency becomes dedup + left-anti join,
- external services (geocode / weather) become pluggable providers with
  deterministic lookup-table fixtures as the default,
- and the whole pipeline is one declarative DAG that Catalyst optimizes
  (broadcast joins, pushdown, pruning, AQE).

Beyond reference parity, ``datapipe/`` adds the large-scale
training-data operators (dedup families, similarity search, text
analysis, multimodal column plumbing) designed for 100 TB inputs.
"""

from enriched_crime_incident_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
