"""Custom stateful streaming operators via applyInPandasWithState.

The reference engine is batch-only, so these are the Structured-Streaming
re-expressions of its batch analytics for a continuously-arriving corpus
(SURVEY §2.K): per-key state lives in the state store, each micro-batch
folds its rows into the state, and the operator emits updated aggregates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def sessionize_stream(
    events: DataFrame,
    gap_us: int = 30 * 60 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful gap-based sessionization of an event stream — the
    streaming twin of the batch lag-window sessionize (driver entry
    ``events_sessionize``): a new session starts when the gap to the
    previous event exceeds ``gap_us`` microseconds.

    Per-user state = (last event micros, cumulative session count,
    cumulative event count), carried across micro-batches in the state
    store (``applyInPandasWithState``). Each micro-batch emits the
    updated cumulative row for every user it touched; the LAST emit per
    user is the final answer.

    Assumes per-user event-time ordering ACROSS micro-batches (each
    batch's events are later than the previous batch's, e.g. an ordered
    ingestion log); within a batch rows are sorted here. Late data needs
    a watermark + event-time re-sort upstream, which this operator
    deliberately leaves to the source contract — same as the batch twin,
    which sees totally-ordered input."""
    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_type = StructType(
        [
            StructField("last_us", LongType()),
            StructField("n_sessions", LongType()),
            StructField("n_events", LongType()),
        ]
    )

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        ts_all = []
        for pdf in pdfs:
            col = pdf["__ts_us"]
            if len(col):
                ts_all.append(col.to_numpy(dtype=np.int64))
        if ts_all:
            ts = np.sort(np.concatenate(ts_all))
            gaps_open = np.empty(len(ts), dtype=bool)
            gaps_open[0] = last_us is None or ts[0] - last_us > gap_us
            if len(ts) > 1:
                gaps_open[1:] = (ts[1:] - ts[:-1]) > gap_us
            n_sessions += int(gaps_open.sum())
            n_events += len(ts)
            last_us = int(ts[-1])
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    src = events.select(
        F.col(user_col).cast("bigint").alias(user_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__ts_us"),
    )
    return src.groupBy(user_col).applyInPandasWithState(
        fold, out_type, state_type, "update", GroupStateTimeout.NoTimeout
    )


def running_dedup_stream(
    docs: DataFrame,
    key_expr,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST document seen for each
    dedup key (e.g. a text fingerprint), across all micro-batches — the
    streaming form of ``dedup.exact_dedup``'s keep-first semantics for a
    continuously-ingested corpus. Per-key state is one boolean (seen).

    key_expr: a Column producing the dedup key (e.g.
    ``F.md5(F.col("text"))``)."""
    out_type = StructType(
        [
            StructField("key", StringType()),
            StructField("doc_id", LongType()),
        ]
    )
    state_type = StructType([StructField("seen", LongType())])

    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first_id = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                first_id = m if first_id is None else min(first_id, m)
        if state.exists or first_id is None:
            # key already emitted in an earlier batch (or empty group)
            return
        state.update((1,))
        yield pd.DataFrame({"key": [key[0]], "doc_id": [first_id]})

    src = docs.select(
        key_expr.cast("string").alias("key"),
        F.col(id_col).cast("bigint").alias("doc_id"),
    )
    return src.groupBy("key").applyInPandasWithState(
        fold, out_type, state_type, "update", GroupStateTimeout.NoTimeout
    )
