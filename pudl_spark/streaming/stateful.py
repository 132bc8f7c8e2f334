"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed/session aggregations (pipeline.py) cover the
reference's needs; this is the escape hatch for operator semantics
Spark lacks — per-key state that evolves across micro-batches with
explicit timeout handling (the Structured Streaming analog of the
reference's stateful per-entity passes, e.g. run-length screens over
an unbounded feed).

`running_user_totals` keeps (count, sum) per user in the state store
and emits the updated running totals each micro-batch — the canonical
shape: swap the update function to implement drift detectors, online
quantile sketches, or session models with custom eviction.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
])


def _update(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [s],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across micro-batches.

    State is O(distinct users); NoTimeout keeps entries forever —
    production feeds would use ProcessingTimeTimeout + state.remove()
    for churned keys. Works on a batch frame too (one 'micro-batch'),
    which is what the parity test exploits.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
