"""A/B: q146_rarity_score — r11 double-tokenize shape vs HEAD grain
checkpoint (r12#31)."""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from adhesive_spark.sources.registry import load_table  # noqa: E402

CHECK_EQUAL = True


def r11_shape(spark, sf_dir):
    from adhesive_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("word")
    )
    vocab = tok.groupBy("word").agg(F.count("*").alias("cnt"))
    ranked = vocab.select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "word"))
        .alias("rank"),
    )
    per_doc = (
        tok.join(F.broadcast(ranked), "word")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("rank").alias("rank_sum"),
        )
        .select(
            "doc_id",
            "source",
            F.expr("(rank_sum * 100) div n_tok").alias("rarity_x100"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr("(sum(rarity_x100)) div count(*)").alias("mean_rarity_x100"),
        F.max("rarity_x100").alias("max_rarity_x100"),
        (
            F.max(
                F.col("rarity_x100") * F.lit(100_000_000) + F.col("doc_id")
            )
            % F.lit(100_000_000)
        ).alias("most_rare_doc"),
    )


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.curation_queries import q146_rarity_score

    return q146_rarity_score(spark, sf_dir)


VARIANTS = {"r11": r11_shape, "head": head_shape}
