"""Structured-streaming operator namespace (each symbol's home module
documents watermarks, state bounds, and the epoch-commit protocol)."""

from adhesive_spark.streaming.ops import (
    read_accepted_docs,
    read_rollup_state,
    read_routed,
    sessionized_counts,
    stream_dedup,
    streaming_cdc_apply,
    streaming_incremental_dedup,
    streaming_quality_router,
    streaming_rollup_maintenance,
    tumbling_counts,
)

__all__ = [
    "read_accepted_docs",
    "read_rollup_state",
    "read_routed",
    "sessionized_counts",
    "stream_dedup",
    "streaming_cdc_apply",
    "streaming_incremental_dedup",
    "streaming_quality_router",
    "streaming_rollup_maintenance",
    "tumbling_counts",
]
