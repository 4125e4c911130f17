"""Great-circle bearing and compass bucketing as pure column math.

Reference semantics: /root/reference/src/enrich/geography.py:27-36 —
initial bearing from TOWN_CENTER to the point, then bucket into one of
8 compass directions 45° wide centred on N/NE/E/...

No UDFs: `radians/sin/cos/atan2/degrees/pmod` keep the whole
computation inside whole-stage codegen, so it scales as a map-only
stage at any data size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.config import (
    COMPASS_DIRECTIONS,
    TOWN_CENTER,
)


def bearing_degrees(
    lat: Column,
    lon: Column,
    origin_lat: float = TOWN_CENTER[0],
    origin_lon: float = TOWN_CENTER[1],
) -> Column:
    """Initial great-circle bearing (degrees in [0, 360)) from the
    origin to (lat, lon).

    Formula parity with reference src/enrich/geography.py:27-35:
      x = cos(lat2)·sin(Δlon)
      y = cos(lat1)·sin(lat2) − sin(lat1)·cos(lat2)·cos(Δlon)
      bearing = (degrees(atan2(x, y)) + 360) mod 360
    """
    lat1 = F.radians(F.lit(origin_lat))
    lon1 = F.radians(F.lit(origin_lon))
    lat2 = F.radians(lat)
    lon2 = F.radians(lon)
    dlon = lon2 - lon1
    x = F.cos(lat2) * F.sin(dlon)
    y = F.cos(lat1) * F.sin(lat2) - F.sin(lat1) * F.cos(lat2) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(x, y)) + F.lit(360.0), F.lit(360.0))


def compass_bucket(bearing: Column) -> Column:
    """Bearing → one of N/NE/E/SE/S/SW/W/NW via half-open 45° buckets.

    Uses the boundary-stable ``floor((bearing + 22.5) / 45) mod 8``
    formulation (identical to round-half-up of bearing/45). Grid-like
    inputs land on cardinal bearings (0/90/180/270), which sit in the
    middle of these buckets — so float jitter never flips the bucket.
    """
    idx = F.floor(F.pmod(bearing + F.lit(22.5), F.lit(360.0)) / F.lit(45.0))
    return F.element_at(
        F.array(*[F.lit(d) for d in COMPASS_DIRECTIONS]), (idx + 1).cast("int")
    )


def compass_bucket_half_even(bearing: Column) -> Column:
    """Exact reference parity variant: Python ``round()`` is
    banker's (half-to-even) rounding — reference
    src/enrich/geography.py:36 does
    ``DIRS[round(bearing / 45) % 8]``. Spark's ``bround`` matches
    half-even; use this variant when bit-level parity with the
    reference on exact 22.5°+k·45° boundaries matters.
    """
    idx = F.pmod(F.bround(bearing / F.lit(45.0)), F.lit(8))
    return F.element_at(
        F.array(*[F.lit(d) for d in COMPASS_DIRECTIONS]), (idx + 1).cast("int")
    )


def side_of_town_col(
    lat: Column,
    lon: Column,
    origin_lat: float = TOWN_CENTER[0],
    origin_lon: float = TOWN_CENTER[1],
) -> Column:
    """NULL-safe side-of-town: NULL coordinates → NULL side
    (reference skips NULL-coordinate rows,
    src/enrich/geography.py:23-25)."""
    side = compass_bucket(bearing_degrees(lat, lon, origin_lat, origin_lon))
    return F.when(lat.isNotNull() & lon.isNotNull(), side)
