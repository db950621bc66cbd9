"""Curation-operator unit tests: golden values on crafted inputs
(PII redaction, stratified sampling, per-group caps, contamination,
embedding quantization)."""

import pytest
from pyspark.sql import functions as F

from adhesive_spark.operators.curation import (
    cap_per_group,
    contamination_pairs,
    pii_counts,
    redact_pii,
    stratified_hash_sample,
)
from adhesive_spark.operators.similarity import quantize_embeddings


def test_redact_pii_golden(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "mail a.b@x.co or c@y.org, call 555-123-4567, "
                "ssn 987-65-4321, from 192.168.0.1 ok",
            ),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    c = F.col("text")
    counts = pii_counts(c)
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ssn"].alias("s"),
            counts["ip"].alias("i"),
            redact_pii(c).alias("red"),
        ).collect()
    }
    assert (rows[1].e, rows[1].p, rows[1].s, rows[1].i) == (2, 1, 1, 1)
    assert rows[1].red == (
        "mail <EMAIL> or <EMAIL>, call <PHONE>, ssn <SSN>, from <IP> ok"
    )
    assert (rows[2].e, rows[2].p, rows[2].s, rows[2].i) == (0, 0, 0, 0)
    assert rows[2].red == "no pii here"


def test_stratified_hash_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
        "k long, s string",
    )
    kept = stratified_hash_sample(df, "k", "s", {"a": 1.0, "b": 0.0})
    got = sorted(r.k for r in kept.collect())
    assert got == [i for i in range(400) if i % 2 == 0]  # a=all, b=none
    half = stratified_hash_sample(df, "k", "s", {"a": 0.5}, default_rate=0.5)
    n1 = sorted(r.k for r in half.collect())
    n2 = sorted(r.k for r in half.collect())
    assert n1 == n2  # pure function of the key — identical on rerun
    assert 100 < len(n1) < 300  # ~50% of 400, md5-bucket variance


def test_cap_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, float(100 - i)) for g in ("x", "y") for i in range(20)],
        "g string, i long, v double",
    )
    out = cap_per_group(df, "g", [F.col("v").desc(), F.col("i")], k=3)
    rows = out.collect()
    assert len(rows) == 6
    per_g = {g: sorted(r.i for r in rows if r.g == g) for g in ("x", "y")}
    assert per_g == {"x": [0, 1, 2], "y": [0, 1, 2]}  # highest v = lowest i
    assert all(1 <= r.rank <= 3 for r in rows)


def test_contamination_pairs_finds_planted_excerpt(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (2, "completely unrelated words about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # verbatim 12-token excerpt of doc 1
        [(100, "gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi")],
        "doc_id long, text string",
    )
    out = contamination_pairs(train, bench, n=8, min_overlap=1)
    rows = out.collect()
    assert [(r.train_id, r.bench_id) for r in rows] == [(1, 100)]
    # 12 tokens → 5 eight-gram shingles, all contained in doc 1
    assert rows[0].n_common == 5
    assert rows[0].containment == 1.0


def test_quantize_embeddings_golden(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert list(rows) == [1]  # zero vector dropped (scale 0)
    r = rows[1]
    assert r.n_dims == 3 and r.scale == 1.0
    # round(127), round(-63.5) → -64 (half away from zero), round(31.75) → 32
    assert (r.q_min, r.q_max, r.q_sum) == (-64, 127, 95)
    assert 0 <= r.rmse < 0.005  # < half a quantization step


def test_mixture_sample_hits_target_proportions(spark):
    from adhesive_spark.operators.curation import mixture_sample

    # 1000 'a' rows, 100 'b' rows; target 50/50 at 160 total →
    # a-rate 0.08 (~80 rows), b-rate clamps to min(1, 80/100)=0.8 (~80)
    rows = [(i, "a") for i in range(1000)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, s string")
    kept = mixture_sample(
        df, "k", "s", {"a": 0.5, "b": 0.5}, target_total=160
    )
    by = {r.s: r.n for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 50 <= by["a"] <= 110  # ~80 expected, md5-bucket variance
    assert 60 <= by["b"] <= 100  # ~80 expected
    # determinism: identical on rerun
    by2 = {r.s: r.n for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by == by2
    # a stratum cannot be upsampled past its size
    tiny = mixture_sample(df, "k", "s", {"b": 1.0}, target_total=10000)
    assert tiny.count() == 100  # all of b, none of a


def test_stratified_sample_unknown_stratum_uses_default(spark):
    df = spark.createDataFrame([(i, "z") for i in range(50)], "k long, s string")
    none_kept = stratified_hash_sample(df, "k", "s", {"a": 1.0})
    assert none_kept.count() == 0  # default_rate=0.0
    all_kept = stratified_hash_sample(df, "k", "s", {}, default_rate=1.0)
    assert all_kept.count() == 50


def test_apply_masking_policy_goldens(spark):
    from adhesive_spark.operators.curation import apply_masking_policy

    df = spark.createDataFrame(
        [(1, "Alice", 1863.84, "AB"), (2, "Bo", 999.0, "CD")],
        "id int, name string, bal double, seg string",
    )
    out = apply_masking_policy(
        df,
        {"id": "hash", "name": "partial", "bal": ("bucket", 1000),
         "seg": "null"},
    ).collect()
    import hashlib

    r1 = next(r for r in out if r["name"] == "A***e")
    assert r1["id"] == hashlib.md5(b"1").hexdigest()[:8]
    assert r1["bal"] == 1000 and r1["seg"] is None
    r2 = next(r for r in out if r["name"] == "**")  # <=2 chars fully masked
    assert r2["bal"] == 0
    # unlisted columns pass through + unknown policy rejected
    assert apply_masking_policy(df, {}).collect()[0]["name"] == "Alice"
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown masking policy"):
        apply_masking_policy(df, {"id": "rot13"})
