"""A/B: q263_link_prediction — HEAD (part_deg aggregate + merge-joined
hub filter, evaluated once per self-join alias) vs the window-in-
exchange shape (pd as a count window over ONE p-keyed exchange,
checkpointed once so both pair-join sides read the filtered stream)."""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from adhesive_spark.sources.registry import load_table  # noqa: E402

CHECK_EQUAL = True


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.eval_queries import q263_link_prediction

    return q263_link_prediction(spark, sf_dir)


def window_shape(spark, sf_dir):
    from adhesive_spark.queries.eval_queries import _LP_MAX_PART_DEG

    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    supp_deg = edges.groupBy("s").agg(
        F.count("*").cast("long").alias("sd")
    ).localCheckpoint(eager=True)
    e = (
        edges.repartition("p")
        .withColumn("pd", F.count("*").over(Window.partitionBy("p")))
        .where(F.col("pd") <= _LP_MAX_PART_DEG)
        .localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), "p")
        .where(F.col("a.s") < F.col("b.s"))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(
            F.count("*").cast("long").alias("common"),
            F.sum(F.expr("1000000 div (length(bin(a.pd)) - 1)"))
            .cast("long")
            .alias("adamic_adar_ppm"),
        )
        .where(F.col("common") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(
                supp_deg.withColumnRenamed("s", "s1").withColumnRenamed(
                    "sd", "d1"
                )
            ),
            "s1",
        )
        .join(
            F.broadcast(
                supp_deg.withColumnRenamed("s", "s2").withColumnRenamed(
                    "sd", "d2"
                )
            ),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "common",
            F.expr(
                "CAST(common * 1000000 div (d1 + d2 - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            "adamic_adar_ppm",
        )
        .orderBy(F.col("jaccard_ppm").desc(), F.col("s1"), F.col("s2"))
        .limit(20)
    )


VARIANTS = {"head": head_shape, "window": window_shape}
