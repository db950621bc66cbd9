"""Grouped-map / UDAF / UDTF surface tests (the UDF shapes beyond the
reference's scalar-only factory, SURVEY §2.2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from adhesive_spark.operators.grouped import (
    register_sentences_udtf,
    register_weighted_mean,
    zscore_by_group,
)


def test_zscore_by_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        "g string, x double",
    )
    out = {
        (r.g, r.x): r.z
        for r in zscore_by_group(df, "x", ["g"], ndigits=4).collect()
    }
    # group a: mean 2, pop-std sqrt(2/3)
    assert out[("a", 2.0)] == 0.0
    assert out[("a", 1.0)] == pytest.approx(-1.2248, abs=1e-4)
    assert out[("a", 3.0)] == pytest.approx(1.2247, abs=1e-4)
    # zero-variance group → z = 0, not NaN/inf
    assert out[("b", 10.0)] == 0.0


def test_weighted_mean_udaf(spark):
    register_weighted_mean(spark, "t_wmean")
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "g string, v double, w double",
    )
    df.createOrReplaceTempView("t_wm")
    rows = {
        r.g: r.m
        for r in spark.sql(
            "SELECT g, t_wmean(v, w) AS m FROM t_wm GROUP BY g"
        ).collect()
    }
    assert rows["a"] == pytest.approx((10 + 60) / 4.0)
    assert rows["b"] == pytest.approx(5.0)


def test_sentences_udtf(spark):
    register_sentences_udtf(spark, "t_sent")
    spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, "One."), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("t_docs")
    rows = spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM t_docs d, LATERAL t_sent(d.doc_id, d.text) s
        ORDER BY s.doc_id, s.sent_idx
        """
    ).collect()
    assert [(r.doc_id, r.sent_idx, r.sentence) for r in rows] == [
        (1, 0, "Hello world"),
        (1, 1, "How are you"),
        (1, 2, "Fine"),
        (2, 0, "One"),
    ]
    assert all(r.n_chars == len(r.sentence) for r in rows)
