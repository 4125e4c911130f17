"""Bronze → typed silver (reference §2 F1/F3/F4/F10).

One narrow map-only projection: timestamp parse, day-of-week, hour,
EMS flag. No shuffle; Catalyst prunes unread bronze columns at the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import EMSSTAT_ORI
from enriched_crime_incident_data_pipeline_spark.functions.datetime_fns import (
    day_of_week,
    hour_of_day,
    parse_incident_ts,
)


def to_silver(bronze: DataFrame) -> DataFrame:
    """5 raw string columns → typed incident rows.

    Derivation parity:
    - incident_ts: ``M/d/yyyy H:mm`` parse (src/db/incidents.py:33-34)
    - day_of_week: 1=Sunday..7=Saturday (src/pdf/parse_incidents.py:9-20)
    - time_of_day: hour 0-23 (src/db/incidents.py:25)
    - emsstat: 1 iff incident_ori == 'EMSSTAT' (src/db/incidents.py:27)
    """
    ts = parse_incident_ts(F.col("datetime_str"))
    return bronze.select(
        F.col("incident_num"),
        ts.alias("incident_ts"),
        day_of_week(ts).alias("day_of_week"),
        hour_of_day(ts).alias("time_of_day"),
        F.col("location"),
        F.col("nature"),
        F.when(F.col("incident_ori") == EMSSTAT_ORI, F.lit(1))
        .otherwise(F.lit(0))
        .alias("emsstat"),
    )
