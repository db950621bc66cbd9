"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf0.001.
``queries()`` — every implemented operator (SURVEY §2.2 + extensions).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
ops whose semantics aren't SQL-expressible; driver then records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary + factory UDF end-to-end
    on /root/testdata/sf0.001."""
    from adhesive_spark.queries.udf_queries import q23_udf_python_agg

    return q23_udf_python_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from adhesive_spark.queries.relational import RELATIONAL_QUERIES
    from adhesive_spark.queries.udf_queries import UDF_QUERIES

    out: dict[str, Callable] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(UDF_QUERIES)
    try:
        from adhesive_spark.queries.pipeline_queries import PIPELINE_QUERIES

        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.advanced_queries import ADVANCED_QUERIES

        out.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.curation_queries import CURATION_QUERIES

        out.update(CURATION_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from adhesive_spark.queries.relational import RELATIONAL_ORACLES
    from adhesive_spark.queries.udf_queries import UDF_ORACLES

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(UDF_ORACLES)
    try:
        from adhesive_spark.queries.pipeline_queries import PIPELINE_ORACLES

        out.update(PIPELINE_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.advanced_queries import ADVANCED_ORACLES

        out.update(ADVANCED_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.curation_queries import CURATION_ORACLES

        out.update(CURATION_ORACLES)
    except ImportError:
        pass
    return out
