"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin (registry ``sessionization``) counts sessions per user
with a 30-minute-gap rule via lag/window. The streaming formulation
keeps per-user state ``(last_ts, n_sessions)`` across micro-batches:
each batch's events are sorted, gaps > 30 min (or a fresh key) start
a new session, and the running count is emitted in ``update`` mode.

Scale: state is two scalars per user key — an
``applyInPandasWithState`` shuffle on ``user_id`` partitions the key
space across executors and the state store holds O(|users|), not
O(|events|). On a bounded single-batch run the emitted counts equal
the batch query exactly, which is how the driver oracle checks it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

_OUT_DDL = "user_id bigint, n_sessions bigint"
_STATE_DDL = "last_ts double, n_sessions bigint"


def _update_sessions(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, n_sessions = state.get
    else:
        last_ts, n_sessions = None, 0
    for pdf in batches:
        for ts in pdf["ts"].sort_values():
            epoch = ts.timestamp()
            if last_ts is None or epoch - last_ts > SESSION_GAP_S:
                n_sessions += 1
            last_ts = epoch
    state.update((last_ts, n_sessions))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions]})


def session_counts_stateful(stream: DataFrame) -> DataFrame:
    """Per-user session counts as a stateful streaming transform:
    ``(user_id, n_sessions)`` emitted each micro-batch in update
    mode."""
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=_OUT_DDL,
            stateStructType=_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
