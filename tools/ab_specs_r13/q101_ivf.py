"""A/B: q101_knn_ivf_refined — r11 similarity.py (final assignment
re-reads the corpus source) vs HEAD (assignment scans the materialized
vectors, r12#24)."""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

import _r11  # noqa: E402

from adhesive_spark.sources.registry import load_table  # noqa: E402

CHECK_EQUAL = True

_old_sim = _r11.load("adhesive_spark/operators/similarity.py")


def _sides(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") >= 10)
    return corpus, queries


def r11_shape(spark, sf_dir):
    corpus, queries = _sides(spark, sf_dir)
    return _old_sim.knn_ivf(
        corpus, queries, k=5, n_lists=8, n_probe=2, refine_iters=2
    )


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.advanced_queries import q101_knn_ivf_refined

    return q101_knn_ivf_refined(spark, sf_dir)


VARIANTS = {"r11": r11_shape, "head": head_shape}
