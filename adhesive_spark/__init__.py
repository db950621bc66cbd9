"""adhesive_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of milenkovicm/adhesive.

The reference (``/root/reference``) is a DataFusion ``FunctionFactory`` demo:
``CREATE FUNCTION … LANGUAGE JAVA AS '<source>'`` compiles the body at DDL
time and registers a scalar UDF executed over Arrow batches
(reference: src/fusion.rs:22-80, java/.../Adhesive.java:27).

This package rebuilds that capability Spark-first:

- :class:`AdhesiveSession` — a ``SparkSession`` wrapper whose ``sql()``
  intercepts ``CREATE FUNCTION`` DDL (Spark's grammar has no inline-body
  form) and delegates everything else to Spark SQL / Catalyst.
- :mod:`adhesive_spark.functions` — the function factory: DDL parsing,
  runtime compilation, registration, error taxonomy.
- :mod:`adhesive_spark.operators` — large-scale data-pipeline operators
  (dedup, similarity search, text analysis, multimodal, as-of join).
- :mod:`adhesive_spark.sources` — table registration helpers.
- :mod:`adhesive_spark.streaming` — structured-streaming helpers.
"""

from adhesive_spark.errors import (
    AdhesiveError,
    CompileError,
    DdlParseError,
    UnknownFunctionError,
    UnsupportedTypeError,
)
from adhesive_spark.session import AdhesiveSession, build_spark

__all__ = [
    "AdhesiveSession",
    "build_spark",
    "AdhesiveError",
    "CompileError",
    "DdlParseError",
    "UnknownFunctionError",
    "UnsupportedTypeError",
]

__version__ = "0.1.0"
