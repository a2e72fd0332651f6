"""Custom stateful streaming operator (applyInPandasWithState).

The brief's escape hatch for semantics the built-in windowed aggs can't
express: arbitrary per-key state evolved across micro-batches in
Arrow-batched pandas. Demonstrated with a running per-user accumulator
(count + sum + last-seen epoch) that emits the refreshed totals for
every key touched in a batch — the building block for online feature
stores / per-entity counters at stream scale.

State layout notes for 100 TB streams: state is per *group* (hash-
partitioned by user_id across executors), pinned small (three scalars),
and should carry a timeout (`GroupStateTimeout`) in production so idle
keys age out — the test uses NoTimeout for determinism.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("last_epoch", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_epoch", LongType()),
])


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].max().timestamp()))
    state.update((n, total, last))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "last_epoch": [last],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals, emitted (refreshed) each micro-batch the
    user appears in. Works on a stream; on a batch frame it degrades to
    a single 'micro-batch' and equals the plain groupBy aggregate."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
