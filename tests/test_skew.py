"""Salted join: result-identical to the plain join, salt spread bounded."""

from pyspark.sql import functions as F

from adhesive_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    got = sorted(
        (r.row_id, r.v)
        for r in salted_join(left, right, "k", n_salts=8).collect()
    )
    want = sorted(
        (r.row_id, r.v) for r in left.join(right, "k").collect()
    )
    assert got == want


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 99)], "row_id long, k long")
    right = spark.createDataFrame([(10, "x")], "k long, v string")
    rows = {
        r.row_id: r.v
        for r in salted_join(left, right, "k", n_salts=4, how="left").collect()
    }
    assert rows == {1: "x", 2: None}


def test_salted_join_rejects_right(spark):
    df = spark.range(1)
    try:
        salted_join(df, df, "id", how="right")
        assert False, "expected ValueError"
    except ValueError:
        pass
