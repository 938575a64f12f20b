"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two operators the reference's semantics ask for but Spark's built-ins
cannot express directly:

- ``streaming_dedup_first_wins`` — keep only the FIRST occurrence of each
  key across micro-batches, with a state TTL. The built-in
  ``dropDuplicates`` on a stream keeps unbounded state;
  ``dropDuplicatesWithinWatermark`` bounds state but needs event-time
  watermarks on every row. This operator bounds state with a processing-
  time TTL instead — the shape used for at-least-once mutation streams
  where the reference's per-key ``.intern()`` lock deduplicates writers
  (ref ElasticIndex.java:449-458).

- ``running_counts`` — per-key running aggregate (count + last value)
  emitted every batch — the incremental analogue of the engine's
  metadata counters (A1) for monitoring a mutation stream.

State is one pandas row per key; Arrow moves grouped batches, so the
Python cost is per-group-batch, not per-row. At scale the state store is
partitioned by key hash across executors (RocksDB-backed on a real
cluster via ``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_dedup_first_wins(stream: DataFrame, key_col: str,
                               payload_cols: list[str],
                               ttl_ms: int = 3_600_000) -> DataFrame:
    """Emit each key's first-seen payload once; re-emit after TTL expiry."""
    out_schema = T.StructType(
        [f for f in stream.schema.fields
         if f.name in (key_col, *payload_cols)])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][[key_col, *payload_cols]]
        if not state.exists and first is not None:
            state.update((True,))
            state.setTimeoutDuration(ttl_ms)
            yield first

    return (stream.groupBy(key_col)
                  .applyInPandasWithState(fn, out_schema, state_schema,
                                          "append",
                                          GroupStateTimeout.ProcessingTimeTimeout))


def running_counts(stream: DataFrame, key_col: str,
                   value_col: str) -> DataFrame:
    """Per-key running (count, sum) emitted on every batch containing the
    key — update-mode stateful aggregation with explicit state."""
    key_field = next(f for f in stream.schema.fields if f.name == key_col)
    out_schema = T.StructType([
        key_field,
        T.StructField("n_total", T.LongType()),
        T.StructField("sum_total", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        batch_n, batch_s = 0, 0.0
        for pdf in pdfs:
            batch_n += len(pdf)
            batch_s += float(pdf[value_col].sum())
        if batch_n:
            n, s = n + batch_n, s + batch_s
            state.update((n, s))
            yield pd.DataFrame({key_col: [key[0]], "n_total": [n],
                                "sum_total": [s]})

    return (stream.groupBy(key_col)
                  .applyInPandasWithState(fn, out_schema, state_schema,
                                          "update",
                                          GroupStateTimeout.NoTimeout))
