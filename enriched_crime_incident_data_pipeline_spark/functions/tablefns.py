"""Python UDTF surface (Spark 4 table functions).

The reference has no user-extensible function system (SURVEY.md §2.8)
— its "UDFs" are three hardcoded enrichment calls. This module is the
engine's table-function extensibility proof, the one-row-to-many-rows
analogue of the scalar Pandas-UDF parity surface
(``functions/pandas_parity.py``): a ``@udtf`` class whose output is
pinned equal to a pure relational formulation (explode + running-sum
window), so the native path remains the documented hot path and the
UDTF is the escape hatch for genuinely imperative row expansion.

Scale note: a UDTF runs row-at-a-time in Python workers — fine for
a bounded expansion like this (output rows ≈ words), wrong for the
hot path when built-ins can express the same thing. ``useArrow=True``
keeps the transfer columnar.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, word string, char_offset int", useArrow=True)
class WordOffsets:
    """text → one row per word with its ordinal and starting char
    offset — the per-row state (running offset) is what makes this a
    table function rather than an explode."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        offset = 0
        for idx, word in enumerate(text.split(" ")):
            yield idx, word, offset
            offset += len(word) + 1


def register_word_offsets(spark) -> None:
    """Make the UDTF callable from SQL as ``word_offsets(...)``."""
    spark.udtf.register("word_offsets", WordOffsets)
