"""Grouped and table-valued user-defined compute — the UDF surfaces the
reference lacks (SURVEY §2.2 marks UDAF/UDTF "absent"; the reference
registers scalar functions only, src/fusion.rs:78
``RegisterFunction::Scalar``). These are the Spark-native extensions:

- :func:`zscore_by_group` — grouped-map ``applyInPandas``: whole-group
  Arrow batch into Python, vectorized numpy compute, Arrow back.
- :func:`register_weighted_mean` — ``pandas_udf`` GROUPED_AGG: a real
  user-defined aggregate running map-side over Arrow batches.
- :func:`register_sentences_udtf` — a Python UDTF (table function):
  one input row → N output rows, usable in SQL ``LATERAL``.

Scale notes: ``applyInPandas`` shuffles on the grouping key and
materializes ONE GROUP PER ARROW BATCH in worker memory — callers must
group on keys with bounded cardinality per group (here: priority buckets,
~N/5 rows each). For unbounded groups prefer window expressions (see
relational.q11) which stream.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def zscore_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    out_col: str = "z",
    ndigits: int = 4,
) -> DataFrame:
    """Per-group z-score via grouped-map ``applyInPandas``.

    The schema is declared statically (group cols + id passthrough +
    z), keeping the Arrow exchange typed end-to-end. Rounding is
    floor-based fixed-point (matches operators.text.fround) so the
    oracle comparison is bit-stable across engines.
    """
    in_cols = df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` double"
    scale = float(10**ndigits)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[value_col].to_numpy(dtype=np.float64)
        mu = x.mean() if len(x) else 0.0
        sd = x.std(ddof=0) if len(x) else 0.0
        z = (x - mu) / sd if sd > 0 else np.zeros_like(x)
        pdf = pdf.copy()
        pdf[out_col] = np.floor(z * scale) / scale
        return pdf

    return df.groupBy(*group_cols).applyInPandas(compute, schema=out_schema).select(
        *in_cols, out_col
    )


def register_weighted_mean(spark: SparkSession, name: str = "wmean") -> None:
    """Register a GROUPED_AGG pandas UDAF: weighted mean Σvw/Σw.

    Runs as a real Catalyst aggregate (partial application over Arrow
    batches); usable from both the DataFrame API and SQL ``GROUP BY``.
    """

    @F.pandas_udf(DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def wmean(v: pd.Series, w: pd.Series) -> float:
        import numpy as np

        wsum = float(np.sum(w.to_numpy(dtype=np.float64)))
        if wsum == 0.0:
            return float("nan")
        return float(
            np.sum(v.to_numpy(dtype=np.float64) * w.to_numpy(dtype=np.float64))
            / wsum
        )

    spark.udf.register(name, wmean)


_SENT_SPLIT = re.compile(r"[.!?]")


def register_sentences_udtf(spark: SparkSession, name: str = "sentences_udtf") -> None:
    """Register a Python UDTF splitting text into sentence segments.

    One document row in → one row per non-empty ``[.!?]``-delimited
    segment out, with its 0-based index and length: the table-function
    shape (SQL ``LATERAL sentences_udtf(doc_id, text)``) the reference's
    scalar-only factory cannot express.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string, n_chars int")
    class Sentences:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            idx = 0
            for part in _SENT_SPLIT.split(text):
                part = part.strip(" ")
                if part:
                    yield doc_id, idx, part, len(part)
                    idx += 1

    spark.udtf.register(name, Sentences)


def register_column_nulls_udtf(spark, name: str = "column_nulls") -> None:
    """POLYMORPHIC Python UDTF (Spark 4): takes a TABLE argument of ANY
    schema — ``analyze()`` runs at plan time against the actual input
    schema, so one registration profiles every table. Each partition's
    instance accumulates per-column (n_rows, n_null) partials in
    O(n_columns) memory and emits them at ``terminate()``; callers roll
    the partials up with a GROUP BY — exactly the map-side-partial /
    reduce shape a distributed profiler needs (never a single-instance
    global pass).
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class ColumnNulls:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType()
                .add("col_name", "string")
                .add("n_rows", "long")
                .add("n_null", "long")
            )

        def __init__(self):
            self.counts = None

        def eval(self, row):
            if self.counts is None:
                self.counts = {k: [0, 0] for k in row.asDict()}
            for k, v in row.asDict().items():
                c = self.counts[k]
                c[0] += 1
                if v is None:
                    c[1] += 1

        def terminate(self):
            if self.counts:
                for k, (n, nn) in self.counts.items():
                    yield (k, n, nn)

    spark.udtf.register(name, ColumnNulls)
