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
    ArrayType,
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


_IV_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_islands", LongType()),
        StructField("covered_us", LongType()),
    ]
)

_IV_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
    ]
)

_IV_TTL_US = 300_000_000


def _update_coverage(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        starts, ends = state.get
        ivs = list(zip(list(starts), list(ends)))
    else:
        ivs = []
    for pdf in batches:
        for us in pdf["s"]:
            ivs.append((int(us), int(us) + _IV_TTL_US))
    ivs.sort()
    merged: list[tuple[int, int]] = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            if e > merged[-1][1]:
                merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    state.update(
        ([s for s, _ in merged], [e for _, e in merged])
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_islands": [len(merged)],
            "covered_us": [sum(e - s for s, e in merged)],
        }
    )


def streaming_interval_coverage(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators.asof.interval_union``: per-user
    merged-interval activity coverage maintained INCREMENTALLY across
    micro-batches — each user's state is its merged island list, so a
    batch only pays for the intervals it touches and the result after
    any prefix of batches equals the batch operator over the data seen
    so far (interval union is order-independent, which is what makes
    the state machine replay-safe).

    State is bounded by the ISLAND count (merged spans), not the event
    count — the interval analog of watermarked dedup state. NoTimeout
    for the bounded test corpus; production would evict idle users via
    EventTimeTimeout exactly as running_user_totals documents."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("s")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_coverage,
        outputStructType=_IV_OUT_SCHEMA,
        stateStructType=_IV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
