"""Custom stateful streaming operator: maintained weighted sample
without replacement via ``applyInPandasWithState``.

The batch twin (``tp15``, :func:`datapipe.corpus.weighted_sample_k`)
draws exactly k rows with Efraimidis–Spirakis exponential keys —
keep the k largest ``u^(1/w)``. E-S keys make the sample MERGEABLE:
the top-k of a union is the top-k of the per-part top-ks, so a
stream can maintain the exact sample with BOUNDED state — per salt
bucket, the current top-k candidate list; never the rows seen.

Topology: keys are computed STATELESSLY per arriving row (the same
sqrt-tier expressions as the batch op — bit-identical doubles), rows
shuffle to ``n_salts`` state keys by ``pmod(id, n_salts)``, each
state holds its bucket's top-k (arrays of id/tier/key — O(k) per
bucket forever), and every micro-batch emits the bucket's current
top-k stamped with a generation counter. The final sample is a batch
post-read: keep each bucket's latest generation, then the global
top-k by ``(es_key DESC, id ASC)`` — exact because of mergeability,
with per-bucket k equal to the global k (the worst case is one
bucket supplying the whole sample).

Scale: state is ``n_salts × k`` rows total regardless of stream
length; the only shuffle is the ``n_salts``-key state exchange. The
second ``applyInPandasWithState`` use in the repo (sessions.py is
the first); update mode, no timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "salt int, gen bigint, doc_id bigint, tier int, es_key double"
)
_STATE_DDL = (
    "gen bigint, ids array<bigint>, tiers array<int>,"
    " keys array<double>"
)


def _make_update(k: int):
    def _update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            gen, ids, tiers, keys = state.get
            cand = list(zip(ids, tiers, keys))
        else:
            gen, cand = 0, []
        for pdf in batches:
            cand.extend(
                zip(pdf["doc_id"], pdf["tier"], pdf["es_key"])
            )
        # E-S selection order: key DESC, id ASC (ties astronomically
        # rare but deterministic)
        cand.sort(key=lambda x: (-x[2], x[0]))
        cand = cand[:k]
        gen += 1
        state.update(
            (
                gen,
                [int(c[0]) for c in cand],
                [int(c[1]) for c in cand],
                [float(c[2]) for c in cand],
            )
        )
        yield pd.DataFrame(
            {
                "salt": [int(key[0])] * len(cand),
                "gen": [gen] * len(cand),
                "doc_id": [int(c[0]) for c in cand],
                "tier": [int(c[1]) for c in cand],
                "es_key": [float(c[2]) for c in cand],
            }
        )

    return _update


def stream_weighted_sample(
    stream: DataFrame, k: int, n_salts: int = 32
) -> DataFrame:
    """Maintained E-S top-``k`` over a stream of
    ``(doc_id, tier, es_key)`` rows: per-salt bounded state, update
    mode; post-process with :func:`finalize_weighted_sample`."""
    salted = stream.select(
        F.pmod(F.col("doc_id"), F.lit(n_salts))
        .cast("int")
        .alias("salt"),
        "doc_id",
        "tier",
        "es_key",
    )
    return salted.groupBy("salt").applyInPandasWithState(
        _make_update(k),
        outputStructType=_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_weighted_sample(emitted: DataFrame, k: int) -> DataFrame:
    """Batch post-read of the update-mode emissions: each salt's
    LATEST generation is its final top-k (earlier generations are
    superseded state snapshots); the global sample is the top-``k``
    of their union — exact by E-S mergeability."""
    from pyspark.sql import Window

    w = Window.partitionBy("salt")
    final = emitted.withColumn("_mg", F.max("gen").over(w)).filter(
        F.col("gen") == F.col("_mg")
    )
    return (
        final.select("doc_id", "tier", "es_key")
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(k)
    )
