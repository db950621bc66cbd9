"""A/B: q280_dsir_importance — r11 broadcast-join shape vs HEAD
single-exchange window shape (VERDICT r12 suspect #1)."""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

from adhesive_spark.sources.registry import (  # noqa: E402
    ensure_parallelism,
    load_table,
)

CHECK_EQUAL = True


def _occ(spark, sf_dir):
    from adhesive_spark.operators.dedup import portable_hash32
    from adhesive_spark.operators.text import bigrams, tokens

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "source",
        F.explode(bigrams(tokens(F.col("text")))).alias("bg"),
    ).select(
        "doc_id",
        "source",
        (
            portable_hash32(F.concat_ws(" ", F.col("bg.w1"), F.col("bg.w2")))
            % 8192
        ).alias("bucket"),
    )


def r11_shape(spark, sf_dir):
    occ = _occ(spark, sf_dir)
    weights = (
        occ.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias(
                "t_cnt"
            ),
            F.sum(F.when(F.col("source") != "src0", 1).otherwise(0)).alias(
                "r_cnt"
            ),
        )
        .select(
            "bucket",
            (
                F.length(F.expr("bin(t_cnt + 1)"))
                - F.length(F.expr("bin(r_cnt + 1)"))
            )
            .cast("long")
            .alias("w"),
        )
    )
    scored = (
        occ.where(F.col("source") != "src0")
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("w").cast("long").alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(20)


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.training_queries import q280_dsir_importance

    return q280_dsir_importance(spark, sf_dir)


VARIANTS = {"r11": r11_shape, "head": head_shape}
