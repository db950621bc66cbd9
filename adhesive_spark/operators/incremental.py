"""Incremental aggregate maintenance.

At 100 TB you never recompute history: a rollup table is maintained by
merging each new micro-batch/partition of facts into the previous
aggregate state. That works exactly for ALGEBRAIC measures — ones with
a merge function over partial states: count/sum merge by +, min/max by
min/max, avg is DERIVED from (sum, count) at read time. (Holistic
measures — exact median, exact distinct — need sketches instead:
approx_count_distinct state, t-digest; see q42 for the HLL path.)

:func:`rollup_events` builds the state shape; :func:`merge_rollup`
merges two states (full outer on keys + coalesced merge expressions);
the invariant ``merge(state(A), state(B)) == state(A ∪ B)`` is what the
oracle checks (q68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_events(events: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate state for the events rollup: algebraic partials only.

    The sum partial is kept as exact integer cents (``value_sum_c``,
    see :func:`adhesive_spark.operators.text.scaled_long`): float sums
    are order-dependent, so an incrementally merged state would drift
    ulps away from a full recompute — the exact invariant
    ``merge(state(A), state(B)) == state(A ∪ B)`` only holds bit-for-bit
    in integer arithmetic. Derive ``value_sum_c / 100.0`` at read time.
    """
    from adhesive_spark.operators.text import scaled_long

    return events.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(scaled_long(F.col("value"), 2)).alias("value_sum_c"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


def merge_rollup(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two rollup states: one full-outer join on the rollup keys,
    then per-measure merge expressions. Shuffle cost is the state size,
    not history size — the point of incremental maintenance."""
    s = state.select(
        *keys,
        *[F.col(c).alias(f"__s_{c}") for c in state.columns if c not in keys],
    )
    d = delta.select(
        *keys,
        *[F.col(c).alias(f"__d_{c}") for c in delta.columns if c not in keys],
    )
    z = F.lit(0).cast("long")
    merged = s.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce("__s_n", z) + F.coalesce("__d_n", z)).alias("n"),
        (
            F.coalesce("__s_value_sum_c", z) + F.coalesce("__d_value_sum_c", z)
        ).alias("value_sum_c"),
        F.least(
            F.coalesce("__s_value_min", F.col("__d_value_min")),
            F.coalesce("__d_value_min", F.col("__s_value_min")),
        ).alias("value_min"),
        F.greatest(
            F.coalesce("__s_value_max", F.col("__d_value_max")),
            F.coalesce("__d_value_max", F.col("__s_value_max")),
        ).alias("value_max"),
    )
    return merged
