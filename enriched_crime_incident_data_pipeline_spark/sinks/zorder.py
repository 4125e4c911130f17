"""Z-order (Morton) clustered writes: multi-dimensional data skipping.

Date-partitioning prunes one dimension; queries that filter two
independent dimensions (e.g. time AND geography, or partkey AND
suppkey) need the file layout itself to cluster both. Interleaving
the bits of the two key columns gives a single sort key whose
contiguous ranges are axis-aligned tiles in (a, b) space — so each
output file's parquet min/max footer covers a tight rectangle, and a
reader's range predicate on EITHER column skips most files. This is
the same layout trick Delta's OPTIMIZE ZORDER applies, built here
from plain column bit-math plus ``repartitionByRange``.

Scale shape: one range shuffle on the z-code (sampled range
boundaries — no global sort), then a per-partition sort. Cost is one
wide stage regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single long (a's bit i → position 2i, b's → 2i+1).
    Larger values clamp into the top tile: callers quantize floats /
    wider ints into [0, 2^bits) first."""
    a_l = F.least(a.cast("long"), F.lit((1 << bits) - 1))
    b_l = F.least(b.cast("long"), F.lit((1 << bits) - 1))
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a_l, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(b_l, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of
    (``col_a``, ``col_b``): range-partition by z-code into
    ``num_files`` buckets, sort within each, drop the helper column.
    Per-file min/max stats then bound a tile in both dimensions."""
    z = morton_code(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
