"""Data-quality operators: column profiling and referential integrity.

A 100 TB training pipeline gates ingest on exactly these checks; both
are single-pass / single-shuffle shapes:

- :func:`column_profile` — ONE wide aggregate over the table computing
  null count, distinct count, and numeric min/max per column, then
  unpivoted to long form (column, metrics). One scan; the distinct
  counts ride the same aggregate (Catalyst plans the expand).
- :func:`fk_orphans` — child rows whose foreign key has no parent
  (left-anti join on the key); returns the violating keys with
  occurrence counts so the report is actionable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, vmin, vmax) per column —
    vmin/vmax as double for numeric columns, NULL otherwise (string
    min/max formatting is engine-specific and excluded by design)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = cols or list(fields)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(fields[c], _NUMERIC)
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(
            (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"__min_{c}")
        )
        aggs.append(
            (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"__max_{c}")
        )
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("vmin"),
                F.col(f"__max_{c}").alias("vmax"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Foreign keys in ``child`` with no matching ``parent`` row:
    (key value, n_rows). NULL keys are excluded (SQL FK semantics)."""
    parent_key = parent_key or child_key
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.where(F.col(child_key).isNotNull())
        .join(keys, child_key, "left_anti")
        .groupBy(child_key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
