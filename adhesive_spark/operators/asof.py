"""As-of (temporal) join.

The reference delegates range/as-of joins to its embedded engine
(SURVEY §2.2 "Range / as-of / interval joins"); Spark has no built-in
as-of join, so this is a composition of existing DataFrame ops.

Implementation: the union-sort trick — tag both sides, union by name,
and carry the most recent right-side row forward with
``last(..., ignorenulls=True)`` over a (keys, time)-ordered window.

Scale characteristics (the reason this shape is chosen over a range
self-join): exactly ONE shuffle on the join keys, no range-explosion
cross product, no broadcast requirement on either side. Skewed keys
behave like any window partition (AQE does not split windows — salt
the key upstream if one entity dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    *,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (or ``<`` when ``strict``), matching on the
    ``by`` keys. Left rows with no prior right row keep NULLs
    (LEFT ASOF JOIN semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``on`` must be an identically-named ordering column on both sides;
    ``right_cols`` selects which right columns to attach (default: all
    non-key, non-time columns).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]
    out_cols = [c + suffix if c in left.columns else c for c in right_cols]

    lhs = left.withColumn("__is_left", F.lit(1))
    rhs = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(a) for c, a in zip(right_cols, out_cols)],
    ).withColumn("__is_left", F.lit(0))
    # allowMissingColumns fills each side's missing columns with NULLs.
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # Right rows sort before left rows at equal time (<= semantics);
    # flip for strict (<) semantics. Ties among right rows resolve by
    # their storage order within the partition sort — callers needing a
    # total order should include a tiebreak column in `on`'s resolution
    # upstream (e.g. pre-dedup right to one row per (by, on)).
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(a + "__filled")
            for a in out_cols
        ],
    )
    result = (
        filled.where(F.col("__is_left") == 1)
        .drop("__is_left", *out_cols)
        .select(
            *left.columns,
            *[F.col(a + "__filled").alias(a) for a in out_cols],
        )
    )
    return result
