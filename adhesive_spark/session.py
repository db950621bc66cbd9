"""Session construction and the SQL interceptor.

``AdhesiveSession`` is the analog of the reference's
``SessionContext::new().with_function_factory(...)``
(examples/adhesive.rs:11-13): a thin wrapper whose ``sql()`` recognizes the
inline-body ``CREATE FUNCTION`` DDL (which Spark's grammar lacks) and routes
it to the factory; every other statement passes through to Spark SQL /
Catalyst untouched — the rebuild inherits the relational surface from Spark
exactly as the reference inherits it from DataFusion (SURVEY §2.2).

``build_spark`` centralizes the scale-oriented defaults: AQE (runtime
re-planning + skew-join handling), Arrow-batched Python UDF transport
(the reference's zero-copy FFI analog, src/jvm.rs:183-219), and Python
worker reuse (the daemon-attached-thread analog, src/jvm.rs:271-274).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from adhesive_spark.functions.ddl import (
    is_create_function,
    is_drop_function,
    parse_drop_function,
)
from adhesive_spark.functions.factory import FunctionFactory

#: Defaults chosen for the 100 TB design point, applied at build time.
#: On a real cluster the shuffle-partition count should track
#: 2-3× total executor cores and target 100-200 MB per shuffle partition —
#: AQE coalescing makes over-provisioning cheap, so err high.
DEFAULT_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # testdata parquet stores tz-naive us timestamps; read them as plain
    # TIMESTAMP at the scan (UTC session => instant-preserving) so ts
    # predicates stay pushdown-eligible and watermarks/windows are legal
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.python.worker.reuse": "true",
    # sources/pydatasource.SyntheticDocsReader implements pushFilters();
    # Spark 4.1 REFUSES such a reader unless pushdown is enabled
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def build_spark(
    app_name: str = "adhesive-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the singleton SparkSession — the JVM-singleton analog
    (src/jvm.rs:27 ``OnceCell``: one engine per process)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(DEFAULT_CONFIGS)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else int(cpus)
    )
    conf.setdefault("spark.driver.memory", "8g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


class AdhesiveSession:
    """SparkSession wrapper with the function-factory SQL interceptor.

    >>> sess = AdhesiveSession(build_spark())
    >>> sess.sql("CREATE FUNCTION f1(BIGINT, BIGINT) RETURNS BIGINT "
    ...          "LANGUAGE PYTHON AS 'return arg0 * arg1'")
    >>> sess.sql("SELECT f1(a, b) FROM t").show()
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or build_spark()
        self.factory = FunctionFactory(self.spark)

    def sql(self, query: str, **kwargs) -> DataFrame:
        if is_create_function(query):
            self.factory.create_function(query)
            # DDL returns an empty OK relation, like DataFusion's DDL result.
            return self.spark.sql("SELECT 1 AS ok WHERE 1 = 0")
        if is_drop_function(query):
            name, if_exists = parse_drop_function(query)
            if name in self.factory.registry:
                self.factory.drop_function(name, if_exists=if_exists)
                return self.spark.sql("SELECT 1 AS ok WHERE 1 = 0")
            # not a factory function: pass through so catalog/temp
            # functions created outside the factory keep Spark's native
            # DROP semantics (pre-interceptor behavior)
            return self.spark.sql(query, **kwargs)
        return self.spark.sql(query, **kwargs)

    # Convenience passthroughs so the wrapper is a drop-in for common use.
    @property
    def read(self):
        return self.spark.read

    @property
    def readStream(self):
        return self.spark.readStream

    @property
    def udf(self):
        return self.spark.udf

    def createDataFrame(self, *args, **kwargs) -> DataFrame:
        return self.spark.createDataFrame(*args, **kwargs)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def stop(self) -> None:
        self.spark.stop()
