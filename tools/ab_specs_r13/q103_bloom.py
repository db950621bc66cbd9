"""A/B: q103_bloom_incremental_dedup — r11 dedup.py (index subtree
evaluated twice) vs HEAD (distinct-fp checkpoint, r12#28)."""

from __future__ import annotations

import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import functions as F  # noqa: E402

import _r11  # noqa: E402

from adhesive_spark.sources.registry import load_table  # noqa: E402

CHECK_EQUAL = True

_old_dedup = _r11.load("adhesive_spark/operators/dedup.py")


def _sides(spark, sf_dir):
    from adhesive_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    index = docs.where(F.col("doc_id") < 250).select(
        fingerprint(F.col("text")).alias("doc_fp")
    )
    batch = docs.where(F.col("doc_id") >= 250)
    return batch, index


def r11_shape(spark, sf_dir):
    batch, index = _sides(spark, sf_dir)
    return _old_dedup.bloom_membership_dedup(
        batch, index, "text", "doc_id", n_words=256, k=4
    )


def head_shape(spark, sf_dir):
    from adhesive_spark.queries.pipeline_queries import (
        q103_bloom_incremental_dedup,
    )

    return q103_bloom_incremental_dedup(spark, sf_dir)


VARIANTS = {"r11": r11_shape, "head": head_shape}
