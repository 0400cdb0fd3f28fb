"""Custom stateful streaming via ``applyInPandasWithState`` — the
escape hatch for operators the built-in window/session state can't
express (reference has no streaming at all; this is the engine
extension point for e.g. per-key online aggregates, CDC-style upserts,
online dedup sets).

Demonstrated operator: per-user running totals, emitted as an update
per micro-batch. State is one row per user (count, sum) — bounded by
key cardinality, not stream length; at scale the state store backend
(RocksDB) spills it off-heap.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals", "RUNNING_TOTALS_SCHEMA"]

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user running-total operator to a
    (streaming or batch-grouped) events DataFrame with columns
    (user_id, value). On a stream, each micro-batch emits the updated
    totals for users seen in that batch (output mode: update)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
