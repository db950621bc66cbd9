"""Semantic contracts for the sketch/retrieval family (q241–q246) —
properties the DuckDB hash check can't see: the HLL estimate must land
inside its theoretical error band, CMS estimates must upper-bound true
counts, the k-core peel must be monotone, and PQ codes must reference
only codebook entries."""

import math

from pyspark.sql import functions as F

from adhesive_spark.queries.sketch_queries import (
    q241_hll_cardinality,
    q242_cms_heavyhitters,
    q243_bm25_retrieval,
    q245_kcore_peel,
    q246_pq_ann,
    q247_attribution,
    q248_ivfpq_ann,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_hll_error_within_band(spark):
    row = q241_hll_cardinality(spark, SF01).collect()[0]
    # m=64 => relative standard error 1.04/sqrt(64) = 13 %; allow 3 sigma
    assert row["exact_distinct"] > 1000  # the target column is large
    rel_err = abs(row["est_hll"] - row["exact_distinct"]) / row[
        "exact_distinct"
    ]
    assert rel_err <= 3 * 1.04 / math.sqrt(64)
    assert row["err_ppm"] == int(
        abs(row["est_hll"] - row["exact_distinct"])
        * 1_000_000
        // row["exact_distinct"]
    )


def test_hll_registers_merge_associatively(spark):
    """Sketching half the stream and max-merging registers must equal
    sketching the whole stream — the property that makes HLL a ONE
    aggregate distributed sketch."""
    from adhesive_spark.operators.sketches import HLL_M, hash60
    from adhesive_spark.sources.registry import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    h = hash60(F.col("l_orderkey"))
    hashed = li.select(
        (h % F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, 6).alias("rem"),
        (F.col("l_orderkey") % 2).alias("half"),
    ).withColumn(
        "rho",
        F.when(F.col("rem") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("rem"))).cast("long")
        ),
    )
    whole = {
        r["bucket"]: r["m"]
        for r in hashed.groupBy("bucket").agg(F.max("rho").alias("m")).collect()
    }
    halves = (
        hashed.groupBy("half", "bucket").agg(F.max("rho").alias("m")).collect()
    )
    merged: dict = {}
    for r in halves:
        merged[r["bucket"]] = max(merged.get(r["bucket"], 0), r["m"])
    assert merged == whole


def test_cms_never_undercounts(spark):
    rows = q242_cms_heavyhitters(spark, SF01).collect()
    assert len(rows) == 10
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["est_cms"] == r["true_cnt"] + r["overcount"] for r in rows)
    # width 16 over a ~30-token vocabulary must actually collide
    assert any(r["overcount"] > 0 for r in rows)


def test_bm25_scores_positive_and_ranked(spark):
    rows = q243_bm25_retrieval(spark, SF01).collect()
    assert 0 < len(rows) <= 15
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_kcore_peel_monotone(spark):
    rows = {r["round"]: r for r in q245_kcore_peel(spark, SF01).collect()}
    assert list(rows) == [1, 2, 3]
    for r in (2, 3):
        assert rows[r]["n_edges"] <= rows[r - 1]["n_edges"]
        assert rows[r]["n_nodes"] <= rows[r - 1]["n_nodes"]
    # the chosen (k, qty-filter) actually cascades at sf0.01: every
    # round removes something, so bounded iteration is exercised
    assert rows[3]["n_edges"] < rows[1]["n_edges"]


def test_attribution_conserves_revenue(spark):
    """Both attribution models must distribute EXACTLY the total
    purchase cents — the largest-remainder split and the direct-channel
    fallback exist precisely for this invariant."""
    from adhesive_spark.sources.registry import load_table

    rows = q247_attribution(spark, SF01).collect()
    total = {
        r["model"]: sum(
            x["attributed_cents"] for x in rows if x["model"] == r["model"]
        )
        for r in rows
    }
    purchases = (
        load_table(spark, SF01, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("c"))
        .agg(F.sum("c").alias("t"))
        .collect()[0]["t"]
    )
    assert total["linear"] == purchases
    assert total["last_touch"] == purchases
    channels = {r["channel"] for r in rows}
    assert channels <= {"click", "view", "direct"}
    assert "direct" in channels  # sparse 24 h windows leave direct mass


def test_ivfpq_subset_of_pq_universe(spark):
    """IVF-PQ results use the same ADC distances as plain PQ wherever
    both score a candidate — the coarse quantizer only PRUNES, it never
    changes a surviving candidate's distance."""
    pq = {
        (r["query_id"], r["vec_id"]): r["dist_adc"]
        for r in q246_pq_ann(spark, SF01).collect()
    }
    ivfpq = q248_ivfpq_ann(spark, SF01).collect()
    assert len(ivfpq) > 0
    for r in ivfpq:
        assert r["vec_id"] >= 16  # corpus excludes codebook + coarse seeds
        key = (r["query_id"], r["vec_id"])
        if key in pq:
            assert pq[key] == r["dist_adc"]


def test_pq_ann_codes_and_ranks(spark):
    rows = q246_pq_ann(spark, SF01).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["dist_adc"] for r in rs]
        assert dists == sorted(dists)
        assert all(r["vec_id"] >= 8 for r in rs)  # codebook seeds excluded
        assert all(r["dist_adc"] >= 0 for r in rs)


def test_hll_grouped_rollup_merges_to_global(spark):
    """Max-merging the per-group registers must reproduce the GLOBAL
    register table — the rollup property that lets per-source estimates
    aggregate upward without a rescan."""
    from adhesive_spark.operators.sketches import hash60, HLL_M
    from adhesive_spark.sources.registry import load_table

    li = load_table(spark, SF, "lineitem").select("l_suppkey", "l_partkey")
    h = hash60(F.col("l_partkey"))
    hashed = li.select(
        "l_suppkey",
        (h % F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, 6).alias("rem"),
    ).withColumn(
        "rho",
        F.when(F.col("rem") == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.bin(F.col("rem"))).cast("long")
        ),
    )
    grouped = hashed.groupBy("l_suppkey", "bucket").agg(
        F.max("rho").alias("m")
    )
    merged_up = {
        r["bucket"]: r["m"]
        for r in grouped.groupBy("bucket").agg(F.max("m").alias("m")).collect()
    }
    global_regs = {
        r["bucket"]: r["m"]
        for r in hashed.groupBy("bucket").agg(F.max("rho").alias("m")).collect()
    }
    assert merged_up == global_regs


def test_basket_affinity_symmetric_support(spark):
    from adhesive_spark.queries.sketch_queries import q250_basket_affinity

    rows = q250_basket_affinity(spark, SF01).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["x"] < r["y"]  # canonical pair orientation
        assert r["c_xy"] >= 3
        assert r["lift_ppm"] > 0
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_forecast_eval_matches_python(spark):
    """MAE/MAPE must equal a pandas replay of the same seasonal-naive
    rule (guards the lag alignment and the integer division order)."""
    from adhesive_spark.queries.sketch_queries import q251_forecast_eval
    from adhesive_spark.sources.registry import load_table

    got = q251_forecast_eval(spark, SF01).collect()[0]
    pdf = (
        load_table(spark, SF01, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev"))
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    rev = list(pdf["rev"])
    pairs = [(rev[i], rev[i - 7]) for i in range(7, len(rev))]
    mae = sum(abs(a - f) for a, f in pairs) // len(pairs)
    mape = sum(abs(a - f) * 1000 // a for a, f in pairs) // len(pairs)
    assert got["n_days"] == len(pairs)
    assert got["mae_cents"] == mae
    assert got["mape_milli"] == mape


def test_chisq_matches_scipy_free_reference(spark):
    """chi2_milli must equal a pure-Python contingency replay (no
    scipy dependency): guards the N*o - r*c expansion and dof."""
    from adhesive_spark.queries.sketch_queries import (
        q252_chisq_independence,
    )
    from adhesive_spark.sources.registry import load_table

    got = q252_chisq_independence(spark, SF01).collect()[0]
    pdf = (
        load_table(spark, SF01, "events")
        .select(
            "event_type",
            (
                (F.expr("unix_micros(ts) div 86400000000") + 3) % 7 >= 5
            ).alias("w"),
        )
        .groupBy("event_type", "w")
        .count()
        .toPandas()
    )
    cells = {
        (r["event_type"], r["w"]): r["count"]
        for r in pdf.to_dict("records")
    }
    n = sum(cells.values())
    rtot: dict = {}
    ctot: dict = {}
    for (et, w), o in cells.items():
        rtot[et] = rtot.get(et, 0) + o
        ctot[w] = ctot.get(w, 0) + o
    chi2 = sum(
        ((o * n - rtot[et] * ctot[w]) ** 2 * 1000)
        // (n * rtot[et] * ctot[w])
        for (et, w), o in cells.items()
    )
    assert got["chi2_milli"] == chi2
    assert got["n_events"] == n
    assert got["dof"] == (len(rtot) - 1) * (len(ctot) - 1)


def test_delta_join_view_rule_is_exact(spark):
    """The three delta terms plus the old view must reproduce the full
    recompute in count AND key checksum — the IVM contract."""
    from adhesive_spark.queries.sketch_queries import q253_delta_join_view

    parts = {
        r["part"]: (r["n"], r["key_sum"])
        for r in q253_delta_join_view(spark, SF01).collect()
    }
    assert set(parts) == {
        "v_old", "delta_a", "delta_b", "delta_ab", "incremental", "recompute",
    }
    n_sum = sum(parts[p][0] for p in ("v_old", "delta_a", "delta_b", "delta_ab"))
    k_sum = sum(parts[p][1] for p in ("v_old", "delta_a", "delta_b", "delta_ab"))
    assert parts["incremental"] == (n_sum, k_sum)
    assert parts["incremental"] == parts["recompute"]
    assert parts["delta_a"][0] > 0 and parts["delta_b"][0] > 0


def test_decay_momentum_bounds(spark):
    from adhesive_spark.queries.sketch_queries import q254_decay_momentum

    rows = q254_decay_momentum(spark, SF01).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 < r["momentum"] <= r["total_40d"]
        assert 0 < r["front_load_ppm"] <= 1_000_000


def test_bitmap_index_lossless(spark):
    from adhesive_spark.queries.sketch_queries import q255_bitmap_index

    r = q255_bitmap_index(spark, SF01).collect()[0]
    assert r["lossless"] == 1
    assert r["and_docs"] == r["and_docs_exact"]
    assert r["or_docs"] >= max(r["docs_t1"], r["docs_t2"])
    assert r["and_docs"] <= min(r["docs_t1"], r["docs_t2"])
    # 62-bit packing: block counts can't exceed ceil(doc space / 62)
    assert r["blocks_t1"] * 62 >= r["docs_t1"]


def test_cms_build_weighted_equals_raw(spark):
    """cms_build from a pre-aggregated (item, count) grain must produce
    the identical counter table as building from the expanded raw
    stream — the property that lets q242 hash |vocab| rows instead of
    re-exploding the corpus (counter merge is ``+``)."""
    from adhesive_spark.operators.sketches import cms_build

    raw = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 3 + [("gamma",)] * 1 + [("delta",)] * 7,
        ["tok"],
    )
    counts = raw.groupBy("tok").agg(F.count("*").cast("long").alias("w"))
    a = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_build(raw, "tok").collect()
    }
    b = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_build(counts, "tok", weight_col="w").collect()
    }
    assert a == b and len(a) > 0
