from enriched_crime_incident_data_pipeline_spark.sinks.output import (
    OUTPUT_COLUMNS,
    gold_projection,
    write_csv,
    write_tsv_stdout,
)

__all__ = ["OUTPUT_COLUMNS", "gold_projection", "write_csv", "write_tsv_stdout"]
