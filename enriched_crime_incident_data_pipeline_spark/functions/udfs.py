"""Arrow-batched Pandas UDFs with exact JVM-expression parity.

UDFs are the engine's slow path (SURVEY.md §2.8): every operator that
CAN be a built-in column expression is one. This module exists for
the cases that genuinely need Python (model scoring, custom
tokenizers, library-bound decode) and pins the contract that makes
them safe at 100 TB: vectorized Arrow transfer (never row-at-a-time)
and results that are bit-identical to the declarative twin, so a UDF
stage can be swapped for a JVM stage without a correctness diff —
proved by the ``udf1_pandas_parity`` oracle query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def _token_count_py(text: pd.Series) -> pd.Series:
    """Vectorized Python twin of ``functions.text.token_count``:
    lowercase, strip non-alphanumerics to spaces, collapse
    whitespace, count tokens. Same regexes, same edge case
    (empty → 0)."""
    norm = (
        text.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9]+", " ", regex=True)
        .str.strip()
    )
    return (
        norm.str.split(r" +", regex=True)
        .map(lambda toks: 0 if toks == [""] else len(toks))
        .astype("int32")
    )


def _signed_area_py(x: pd.Series, y: pd.Series) -> pd.Series:
    """x·y − y/2 with IEEE operation order matching
    ``signed_area_expr`` — multiply, divide, subtract on float64."""
    return x * y - y / 2.0


# pandas_udf resolves types against the active session, so the UDF
# objects are built lazily at call time, not at import time
def token_count_udf(text: Column) -> Column:
    return F.pandas_udf(_token_count_py, "int")(text)


def signed_area_udf(x: Column, y: Column) -> Column:
    return F.pandas_udf(_signed_area_py, "double")(
        x.cast("double"), y.cast("double")
    )


def signed_area_expr(x: Column, y: Column) -> Column:
    """JVM twin of ``signed_area_udf`` (same op order)."""
    return x.cast("double") * y.cast("double") - y.cast("double") / F.lit(2.0)
