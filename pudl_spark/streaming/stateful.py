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


# ---------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters (mergeable-summaries form)
# ---------------------------------------------------------------------

MG_K = 8

MG_OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("est_count", T.LongType()),
])

MG_STATE_SCHEMA = T.StructType([
    T.StructField("items", T.ArrayType(T.LongType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
])


def _mg_merge(counters: dict, batch: dict, k: int) -> dict:
    """Merge exact batch counts into a Misra-Gries summary of size k
    (Agarwal et al. 2012, "Mergeable summaries": add, then subtract
    the (k+1)-th largest count from everything and drop non-positive
    entries). Preserves the MG bound: est >= true - N/(k+1) with N
    the TOTAL weight merged so far — micro-batch boundaries do not
    degrade it, which is what makes the operator streaming-safe.
    """
    for it, c in batch.items():
        counters[it] = counters.get(it, 0) + int(c)
    if len(counters) > k:
        thresh = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - thresh
                    for i, c in counters.items() if c - thresh > 0}
    return counters


def _mg_update_fn(k: int):
    """Build the stateful update function for a k-counter sketch —
    applyInPandasWithState passes no extra arguments, so the sketch
    size must close over the function (a hardcoded module constant
    here would silently ignore the caller's k)."""

    def update(key: Any, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts = state.get
            counters = dict(zip(items, counts))
        else:
            counters = {}
        for pdf in pdfs:
            vc = pdf["user_id"].value_counts()
            counters = _mg_merge(counters, vc.to_dict(), k)
        # Deterministic order: count desc, item asc — state layout
        # and emitted rows are a pure function of the data seen.
        ordered = sorted(counters.items(),
                         key=lambda kv: (-kv[1], kv[0]))
        state.update(([int(i) for i, _ in ordered],
                      [int(c) for _, c in ordered]))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(ordered),
            "user_id": [i for i, _ in ordered],
            "est_count": [c for _, c in ordered],
        })

    return update


def heavy_hitters_stream(events: DataFrame, k: int = MG_K) -> DataFrame:
    """Per-event-type streaming heavy hitters: a bounded Misra-Gries
    sketch (k counters — state is O(k) per key FOREVER, independent
    of stream length) updated each micro-batch, emitting the current
    candidate set in update mode. The batch twin is the same operator
    applied to a static frame (one micro-batch); the exact-recount +
    certificate path for batch data lives in functions/heavy.py —
    this is its unbounded-feed counterpart.
    """
    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _mg_update_fn(k),
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitters_batch(events: DataFrame, k: int = MG_K) -> DataFrame:
    """Batch twin of ``heavy_hitters_stream``: same `_mg_merge`
    kernel, driven by applyInPandas (applyInPandasWithState is
    stream-only). One summary per event_type from the full frame —
    equivalent to the stream processing everything as one micro-batch.
    """
    def one_shot(pdf: pd.DataFrame) -> pd.DataFrame:
        counters = _mg_merge({}, pdf["user_id"].value_counts().to_dict(), k)
        ordered = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]] * len(ordered),
            "user_id": [i for i, _ in ordered],
            "est_count": [c for _, c in ordered],
        })

    return (events.select("event_type", "user_id")
            .groupBy("event_type")
            .applyInPandas(one_shot, MG_OUTPUT_SCHEMA))
