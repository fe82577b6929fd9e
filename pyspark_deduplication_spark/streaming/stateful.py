"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the engine offers for operators the
built-in watermark/window machinery can't express: here, a running
per-user profile (event count, value sum, last-seen timestamp) that emits
an updated row per micro-batch and times out idle users.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("last_ts", T.TimestampType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("last_ts_micros", T.LongType()),
])


def _update_profile(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last_us = max(
                last_us,
                int(pd.to_datetime(pdf["ts"]).max().value // 1_000),
            )
    state.update((n, total, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "sum_value": [total],
        "last_ts": [pd.Timestamp(last_us * 1_000)],
    })


def streaming_user_profiles(events: DataFrame) -> DataFrame:
    """Running per-user aggregates with arbitrary state. Emits one updated
    profile row per user per micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
