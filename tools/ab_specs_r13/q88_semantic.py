"""A/B: q88_semantic_dedup — r11 similarity.py (centroid subtree
re-evaluated per consumer) vs HEAD (centroid checkpoint, entry r12#20)."""

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


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def r11_shape(spark, sf_dir):
    return _old_sim.semantic_dedup_representatives(
        _emb(spark, sf_dir), n_clusters=16
    )


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.advanced_queries import q88_semantic_dedup

    return q88_semantic_dedup(spark, sf_dir)


VARIANTS = {"r11": r11_shape, "head": head_shape}
