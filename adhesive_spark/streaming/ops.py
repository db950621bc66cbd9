"""Structured Streaming operators.

The reference has no streaming surface (SURVEY §2.2 marks it absent);
these are the Spark-first extensions a large-scale event pipeline needs,
built on the same event schema as the batch `events` table so every
streaming op has a batch twin (q22 is the batch twin of
:func:`tumbling_counts`).

All operators take/return streaming DataFrames and are tested with the
file source + ``availableNow`` trigger + memory sink (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts with late-data watermark.

    State size is bounded by the watermark: windows older than
    (max event time - watermark) are finalized and evicted — the knob
    that keeps 100 TB/day streams in bounded executor memory.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sessionized_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based), the streaming-native
    sessionization operator."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks in the preceding ``horizon``.

    Both sides are watermarked and the join condition bounds event-time
    distance, so each side's buffered state is evicted once the other
    side's watermark passes — the state-bounding requirement for
    stream-stream joins at scale.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )


def stream_dedup(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes — the streaming twin of :func:`dedup_exact`."""
    keys = keys or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension — the lookup-table pattern of every event pipeline.
    No state is kept for the static side. Note the static DataFrame's
    file listing is snapshotted at creation: an in-place parquet
    overwrite of its path is NOT picked up (and may fail reads when old
    files vanish); refreshing mid-query needs a transactional table
    format or an explicit re-created DataFrame on restart. The stream
    side carries no watermark requirement because the join adds no
    state.

    ``broadcast_dim=True`` hints the lookup-table case (dim fits on
    executors); pass False for a large dimension so Spark's size-based
    planner can pick a shuffled join instead of failing the broadcast.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on=key, how=how)


def streaming_rollup_maintenance(
    events: DataFrame,
    keys: list[str],
    state_path: str,
    *,
    checkpoint_path: str,
):
    """Streaming materialized view: maintain the algebraic rollup state
    (operators/incremental.py) by merging EACH micro-batch's partial
    aggregate into a parquet state table via ``foreachBatch`` — the
    streaming twin of q68's batch merge.

    Per micro-batch cost is `state ⊕ batch-partial`, never a rescan of
    history, so a 100 TB/day stream maintains a dashboard-size rollup
    with bounded work. foreachBatch is at-least-once, so the state
    carries the last-applied epoch id and a replayed micro-batch is
    skipped instead of double-merged (a table format with transactional
    MERGE hardens the write itself in production).

    Returns the started StreamingQuery; read the state with
    ``spark.read.parquet(state_path)`` after (or during) the run and
    drop the bookkeeping ``__epoch`` column.
    """
    from adhesive_spark.operators.incremental import merge_rollup, rollup_events

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = rollup_events(batch_df, keys)
        try:
            state = spark.read.parquet(state_path)
        except Exception as e:
            # ONLY a missing path means "first epoch"; anything else
            # (corrupt state, schema drift) must fail the query loudly —
            # swallowing it would silently reset accumulated history to
            # this batch's delta.
            msg = str(e)
            if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
                raise
            state = None
        if state is not None:
            applied = state.agg(F.max("__epoch").alias("e")).collect()[0].e
            if applied is not None and applied >= epoch_id:
                return  # replayed micro-batch: already merged
            merged = merge_rollup(state.drop("__epoch"), delta, keys)
        else:
            merged = delta
        merged = merged.withColumn("__epoch", F.lit(epoch_id))
        # materialize BEFORE overwriting the dir being read
        out = merged.collect()
        spark.createDataFrame(out, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_path)

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
