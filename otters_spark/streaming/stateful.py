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

__all__ = [
    "running_user_totals",
    "streaming_cusum",
    "streaming_ewma",
    "streaming_exact_dedup",
    "streaming_transitions",
    "CUSUM_SCHEMA",
    "EWMA_SCHEMA",
    "RUNNING_TOTALS_SCHEMA",
    "TRANSITIONS_SCHEMA",
]

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


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Online exact dedup over a document stream: rows whose normalized
    content key was already seen (in ANY earlier micro-batch) are
    dropped; first occurrence wins. State = one row per distinct key —
    the streaming twin of ``dedup.exact_dedup_keep_first``. At scale the
    key state lives in the state store (RocksDB off-heap), so the
    "seen" set never transits the driver."""
    from pyspark.sql import functions as F

    keyed = docs.select(
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_key"),
        F.col(id_col),
        F.col(text_col),
    )

    out_schema = T.StructType(
        [
            T.StructField("content_key", T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
        ]
    )
    seen_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedupe(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        first_batch = not state.exists
        state.update((True,))
        if not first_batch:
            return
        best = None
        for pdf in pdfs:
            cand = pdf.loc[pdf[id_col].idxmin()]
            if best is None or cand[id_col] < best[id_col]:
                best = cand
        if best is not None:
            yield pd.DataFrame(
                {"content_key": [key[0]], id_col: [best[id_col]], text_col: [best[text_col]]}
            )

    return keyed.groupBy("content_key").applyInPandasWithState(
        dedupe,
        outputStructType=out_schema,
        stateStructType=seen_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("gap_micros", T.LongType()),
    ]
)

_TRANS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_micros", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Online event-transition extraction — the streaming twin of
    ``operators.behavior.transition_matrix``: each micro-batch emits
    one row per observed (from_type → to_type) step, INCLUDING the
    bridge from the user's last event of the previous batch, which no
    stateless per-batch window could see. Downstream aggregation
    (count per pair, sum of gaps) then equals the batch operator's
    table exactly — pinned in tests/test_stateful_streaming.py over a
    multi-micro-batch replay.

    State per user = (last event-time micros, last type): two fields,
    bounded by key cardinality, not stream length — RocksDB-spillable
    like the other stateful lanes. Contract: per-user event-time
    ordering across micro-batches (true for in-order replay and for
    event logs partitioned by arrival time); within a batch rows are
    sorted by (micros, event_id) — the batch operator's tie-break.

    Input needs (user_id, event_id, ts); timestamps are converted to
    int64 micros SPARK-SIDE (``unix_micros``) so the Arrow kernel
    handles only integers — no pandas datetime-unit ambiguity. Events
    with NULL ts are dropped before the kernel: they carry no event
    time (a watermark would drop them too), and a NaN would otherwise
    kill the query inside the int conversion. The batch twin orders
    them NULLS FIRST with NULL gaps — equivalence is promised on
    timestamped data."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__micros"),
        F.col("event_type"),
    ).filter(F.col("__micros").isNotNull())

    def step(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lm, lt = state.get if state.exists else (None, None)
        out: list[tuple] = []
        # a group's micro-batch arrives as MULTIPLE Arrow chunks (split
        # at arrow.maxRecordsPerBatch) in arbitrary order — concat and
        # sort ONCE; per-chunk sorting would walk a >10k-event user out
        # of time order and silently emit wrong transitions
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["__micros", "event_id"]
            )
            for m, et in zip(batch["__micros"], batch["event_type"]):
                m = int(m)
                if lt is not None:
                    out.append((key[0], lt, et, m - lm))
                lm, lt = m, et
        if lt is not None:
            state.update((lm, lt))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "from_type", "to_type", "gap_micros"]
            )

    return keyed.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("num", T.DoubleType()),
        T.StructField("den", T.DoubleType()),
    ]
)


def streaming_ewma(
    events: DataFrame, alpha: float = 0.5, value_col: str = "value"
) -> DataFrame:
    """Online per-user EWMA — the O(1)-state streaming recurrence the
    batch operator's docstring points unbounded series at
    (operators/stats.py:ewma_smooth overflows its rescaled weights
    past ~900 rows per key; this recurrence never does):

        num_i = x_i + (1-a) * num_{i-1}
        den_i = 1  + (1-a) * den_{i-1}
        ewma_i = num_i / den_i          (pandas adjusted ``ewm`` form)

    Emits one row per event with its smoothed value; state per user is
    two doubles, bounded by key cardinality, not stream length.
    Ordering contract and chunk handling follow streaming_transitions:
    per-user event-time order across micro-batches, one concat+sort
    per batch (chunk-local sorting walks large users out of order),
    NULL ts/value rows dropped before the kernel. Equals the batch
    ``ewma_smooth`` per-row to float tolerance (same recurrence, summed
    in a different but fixed order) — pinned over a multi-micro-batch
    replay in tests/test_stateful_streaming.py."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from pyspark.sql import functions as F

    w = 1.0 - alpha
    keyed = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__micros"),
        F.col(value_col).cast("double").alias("__x"),
    ).filter(F.col("__micros").isNotNull() & F.col("__x").isNotNull())

    def step(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        num, den = state.get if state.exists else (0.0, 0.0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows: list[tuple] = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["__micros", "event_id"]
            )
            for eid, x in zip(batch["event_id"], batch["__x"]):
                num = float(x) + w * num
                den = 1.0 + w * den
                rows.append((key[0], int(eid), num / den))
        state.update((num, den))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "event_id", "ewma"])

    return keyed.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("s_pos", T.LongType()),
        T.StructField("s_neg", T.LongType()),
    ]
)

_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp", T.LongType()),
        T.StructField("sn", T.LongType()),
    ]
)


def streaming_cusum(
    events: DataFrame,
    target_micro: int,
    slack_micro: int = 0,
    value_col: str = "value",
) -> DataFrame:
    """Online two-sided CUSUM per user — the O(1)-state twin of the
    batch window identity (operators/stats.py:cusum_scan). The batch
    form replays ``max(0, S + dev)`` through cumulative windows; a
    stream just RUNS the recurrence: state per key is two longs,
    bounded by key cardinality, never stream length. All arithmetic
    in exact integer micros (values snapped on entry), so the
    streamed statistics land EXACTLY on the batch scan's — pinned
    equal, not approximately, over a multi-micro-batch replay in
    tests/test_stateful_streaming.py.

    Ordering contract follows streaming_transitions/streaming_ewma:
    per-user event-time order within and across micro-batches
    (concat+sort per batch; cross-batch order is the replay
    harness's/watermark's contract), NULL ts/value rows dropped
    before the kernel."""
    from pyspark.sql import functions as F

    keyed = events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__micros"),
        F.round(F.col(value_col).cast("double") * 1_000_000)
        .cast("long")
        .alias("__x"),
    ).filter(F.col("__micros").isNotNull() & F.col("__x").isNotNull())

    def step(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sp, sn = state.get if state.exists else (0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows: list[tuple] = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["__micros", "event_id"]
            )
            for eid, x in zip(batch["event_id"], batch["__x"]):
                dev = int(x) - target_micro
                sp = max(0, sp + dev - slack_micro)
                sn = max(0, sn - dev - slack_micro)
                rows.append((key[0], int(eid), sp, sn))
        state.update((sp, sn))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "s_pos", "s_neg"]
            )

    return keyed.groupBy("user_id").applyInPandasWithState(
        step,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
