"""Side-of-town stage (reference §2 U3/J6/F13/F14).

Pure column math — no external I/O, no UDF. The reference computes a
bearing from TOWN_CENTER per distinct location and UPDATE-joins the
compass bucket back (/root/reference/src/enrich/geography.py:9-41);
here it is a map-only expression over rows that already carry
coordinates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.geography import (
    side_of_town_col,
)


def with_side_of_town(
    df: DataFrame, lat_col: str = "latitude", lon_col: str = "longitude"
) -> DataFrame:
    """Add ``side_of_town`` (N/NE/.../NW, NULL when coordinates are
    NULL — geography.py:23-25)."""
    return df.withColumn(
        "side_of_town", side_of_town_col(F.col(lat_col), F.col(lon_col))
    )
