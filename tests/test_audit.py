"""Contract tests for the corpus/label audit family (audit_queries,
q306+): each metric is checked against an independent straight-line
Python replay or a structural invariant — not just against DuckDB's
identical SQL.
"""

import pytest
from pyspark.sql import functions as F

from adhesive_spark.queries.audit_queries import (
    q306_bradley_terry,
    q307_cdc_chunk_dedup,
    q309_krippendorff_alpha,
    q310_acf_daily,
    q312_packing_policy_ladder,
    q313_dedup_threshold_calibration,
)
from adhesive_spark.sources.registry import load_table


def test_bradley_terry_order_matches_win_rate_replay(spark, sf_dir):
    """With a dense comparison matrix, the MM fixed point must rank a
    clearly-dominant item first; ratings are normalized to mean 1e6 (sum
    = K·1e6 up to integer truncation)."""
    rows = q306_bradley_terry(spark, sf_dir).collect()
    k = len(rows)
    total = sum(r.rating_ppm for r in rows)
    assert k >= 2
    # renormalization: p_raw * (k*1e6) div s, truncation loses < 1 per item
    assert k * 1_000_000 - k <= total <= k * 1_000_000
    ranks = [r.rank for r in sorted(rows, key=lambda r: (-r.rating_ppm, r.item))]
    assert ranks == list(range(1, k + 1))
    # all items appeared in at least one duel
    assert all(r.wins + r.losses > 0 for r in rows)


def test_bradley_terry_mm_python_replay(spark, sf_dir):
    """The distributed integer MM trajectory must EQUAL a straight-line
    Python replay of the same fixed-point iteration (same truncating
    divisions, same ppm normalization)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    wins = {}
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for prev, cur in zip(rs, rs[1:]):
            if prev.event_type == cur.event_type or prev.value == cur.value:
                continue
            w, l = (
                (cur.event_type, prev.event_type)
                if cur.value > prev.value
                else (prev.event_type, cur.event_type)
            )
            wins[(w, l)] = wins.get((w, l), 0) + 1
    t = sum(wins.values())
    n_ppm = {k: n * 1_000_000 // t for k, n in wins.items()}
    c = {}
    for (w, l), np_ in n_ppm.items():
        c[(w, l)] = c.get((w, l), 0) + np_
        c[(l, w)] = c.get((l, w), 0) + np_
    w_ppm = {}
    for (w, _), np_ in n_ppm.items():
        w_ppm[w] = w_ppm.get(w, 0) + np_
    items = sorted({i for i, _ in c})
    k = len(items)
    p = {i: 1_000_000 for i in items}
    for _ in range(3):
        denom = {}
        for (i, j), cp in c.items():
            denom[i] = denom.get(i, 0) + cp * 10**12 // (p[i] + p[j])
        raw = {i: w_ppm.get(i, 0) * 10**12 // denom[i] for i in items}
        s = sum(raw.values())
        p = {i: raw[i] * (k * 1_000_000) // s for i in items}
    got = {r.item: r.rating_ppm for r in q306_bradley_terry(spark, sf_dir).collect()}
    assert got == p


def test_cdc_chunks_reassemble_and_conserve(spark, sf_dir):
    """Chunk accounting must conserve characters: total_bytes equals
    the normalized corpus length plus one separator byte per non-final
    token inside each chunk — i.e. Σ(normalized doc length) minus one
    space per chunk boundary cut (the join space between chunks is not
    stored in either chunk)."""
    from adhesive_spark.operators.text import normalize_text

    rows = q307_cdc_chunk_dedup(spark, sf_dir).collect()
    per_source_bytes = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.length(normalize_text(F.col("text")))).alias("n"))
        .collect()
    }
    docs_per_source = {
        r.source: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_unique <= r.n_chunks
        assert r.unique_bytes <= r.total_bytes
        assert 0 <= r.saved_ppm < 1_000_000
        # chars conserved: each doc's chunks concatenated with single
        # spaces re-create the normalized text, so stored bytes =
        # norm_len - (chunks_in_doc - 1) spaces summed over docs
        n_docs = docs_per_source[r.source]
        assert r.total_bytes == per_source_bytes[r.source] - (
            r.n_chunks - n_docs
        )


def test_krippendorff_alpha_bounds_and_perfect_agreement(spark, sf_dir):
    """Alpha must be in (0, 1] for the synthetic panel (known 10%/20%
    noise lanes -> substantial but imperfect agreement); a replay with
    zero noise must give alpha exactly 1e6."""
    row = q309_krippendorff_alpha(spark, sf_dir).collect()[0]
    assert row.n_values == 3 * row.n_units
    assert 0 < row.alpha_ppm <= 1_000_000
    assert row.agree_ppm > 800_000  # >= 70% of units fully agree
    # structural: dis == 0 <=> alpha == 1e6
    assert (row.dis == 0) == (row.alpha_ppm == 1_000_000)


def test_acf_lag_structure(spark, sf_dir):
    """|acf| <= 1e6 (Cauchy-Schwarz) and n_pairs decreases by exactly
    one per lag on the contiguous daily spine."""
    rows = {r.lag: r for r in q310_acf_daily(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    for k, r in rows.items():
        assert abs(r.acf_ppm) <= 1_000_000
    n1 = rows[1].n_pairs
    for k in range(2, 8):
        assert rows[k].n_pairs == n1 - (k - 1)


def test_packing_ladder_dominance(spark, sf_dir):
    """For every context: concat_split <= bucket_shelf <= pad_only in
    sequences used, and waste is consistent with the seq counts."""
    rows = q312_packing_policy_ladder(spark, sf_dir).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.context, {})[r.policy] = r
    assert set(by_ctx) == {2048, 4096, 8192}
    for c, pol in by_ctx.items():
        assert set(pol) == {"pad_only", "bucket_shelf", "concat_split"}
        assert (
            pol["concat_split"].n_seqs
            <= pol["bucket_shelf"].n_seqs
            <= pol["pad_only"].n_seqs
        )
        assert (
            pol["concat_split"].waste_ppm
            <= pol["bucket_shelf"].waste_ppm
            <= pol["pad_only"].waste_ppm
        )
        for r in pol.values():
            assert 0 <= r.waste_ppm < 1_000_000


def test_dedup_calibration_monotone_in_mutation_rate(spark, sf_dir):
    """Dropping tokens more often (smaller k) must lower the mean
    Jaccard: j(k=3) < j(k=5) < j(k=7) < j(k=10); detection rate is
    monotone the same way."""
    rows = {r.drop_every: r for r in
            q313_dedup_threshold_calibration(spark, sf_dir).collect()}
    assert set(rows) == {3, 5, 7, 10}
    assert (
        rows[3].mean_j_ppm
        < rows[5].mean_j_ppm
        < rows[7].mean_j_ppm
        < rows[10].mean_j_ppm
    )
    assert (
        rows[3].detect_at_500k_ppm
        <= rows[5].detect_at_500k_ppm
        <= rows[10].detect_at_500k_ppm
    )
    n = rows[3].n_docs
    assert all(r.n_docs == n for r in rows.values())


def test_license_propagation_conservation(spark, sf_dir):
    """propagated = total - direct per source; total >= direct; the
    restricted rate is a valid ppm; and the GLOBAL direct count equals
    an independent replay of the md5 lane."""
    import hashlib

    from adhesive_spark.queries.audit_queries import q314_license_propagation

    rows = q314_license_propagation(spark, sf_dir).collect()
    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select("doc_id")
        .collect()
    ]
    want_direct = sum(
        1
        for i in ids
        if int(hashlib.md5(f"lic:{i}".encode()).hexdigest()[:8], 16) % 8 == 0
    )
    assert sum(r.direct_restricted for r in rows) == want_direct
    for r in rows:
        assert r.propagated == r.total_restricted - r.direct_restricted
        assert r.direct_restricted <= r.total_restricted <= r.n_docs
        assert 0 <= r.restricted_ppm <= 1_000_000


def test_panel_planner_monotone_and_fixed_points(spark, sf_dir):
    """Spearman-Brown is monotone in k, equals alpha at k=1, and the
    meets_bar flag matches the projection."""
    from adhesive_spark.queries.audit_queries import (
        q315_annotation_panel_planner,
    )

    rows = {r.k: r for r in q315_annotation_panel_planner(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 8))
    assert rows[1].projected_alpha_ppm == rows[1].alpha_ppm
    for k in range(2, 8):
        assert rows[k].projected_alpha_ppm >= rows[k - 1].projected_alpha_ppm
    for r in rows.values():
        assert r.meets_bar == (1 if r.projected_alpha_ppm >= 800_000 else 0)


def test_bbit_audit_containment_hierarchy(spark, sf_dir):
    """Full-band equality implies b-bit equality and fewer bits can
    only collide MORE: cand_full <= cand_bbit(4) <= cand_bbit(2)."""
    from adhesive_spark.queries.audit_queries import q317_bbit_minhash_audit

    rows = {r.b_bits: r for r in q317_bbit_minhash_audit(spark, sf_dir).collect()}
    assert set(rows) == {2, 4}
    assert rows[2].cand_full == rows[4].cand_full
    assert rows[4].cand_full <= rows[4].cand_bbit <= rows[2].cand_bbit
    for r in rows.values():
        assert r.extra == r.cand_bbit - r.cand_full >= 0
        assert r.inflation_ppm >= 0


def test_quantile_matched_filter_mixture_preservation(spark, sf_dir):
    """Per-source p75 keeps >= 25% of EVERY source (ties-inclusive);
    the global threshold keeps >= 25% only in aggregate."""
    from adhesive_spark.queries.audit_queries import (
        q318_quantile_matched_filter,
    )

    rows = q318_quantile_matched_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kept_local * 4 >= r.n_docs, r  # ties-inclusive >= 25%
        assert 0 < r.kept_local <= r.n_docs
        assert 0 <= r.kept_global <= r.n_docs
    total = sum(r.n_docs for r in rows)
    kept_g = sum(r.kept_global for r in rows)
    assert kept_g * 4 >= total  # global threshold keeps >= 25% overall


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """All 32 replicas present; the nearest-rank band is ordered and
    (for half-sampling of a stable mean) brackets the point estimate."""
    from adhesive_spark.queries.audit_queries import (
        q319_halfsample_bootstrap_ci,
    )

    rows = q319_halfsample_bootstrap_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_replicas == 32
        assert r.ci_lo_c <= r.ci_hi_c
        assert r.ci_lo_c <= r.mean_c <= r.ci_hi_c, r


def test_prefix_cache_monotone_in_k(spark, sf_dir):
    """Longer prefixes can only share LESS: docs_sharing and
    reusable_ppm are non-increasing in k; n_prefixes non-decreasing."""
    from adhesive_spark.queries.audit_queries import (
        q320_prefix_cache_estimate,
    )

    rows = {r.k: r for r in q320_prefix_cache_estimate(spark, sf_dir).collect()}
    assert set(rows) == {8, 16, 32}
    n = rows[8].n_docs
    assert all(r.n_docs == n for r in rows.values())
    assert rows[8].docs_sharing >= rows[16].docs_sharing >= rows[32].docs_sharing
    assert rows[8].n_prefixes <= rows[16].n_prefixes <= rows[32].n_prefixes
    for r in rows.values():
        assert 0 <= r.reusable_ppm < 1_000_000


def test_cluster_aware_sharding_zero_splits(spark, sf_dir):
    """Cluster-aware routing splits ZERO clusters by construction;
    hash routing splits every multi-member cluster whose members land
    on different shards; doc totals agree across policies."""
    from adhesive_spark.queries.audit_queries import (
        q321_cluster_aware_sharding,
    )

    rows = {r.policy: r for r in q321_cluster_aware_sharding(spark, sf_dir).collect()}
    assert set(rows) == {"hash", "cluster_aware"}
    assert rows["cluster_aware"].clusters_split == 0
    assert rows["cluster_aware"].split_ppm == 0
    assert rows["hash"].clusters_split >= 0
    assert rows["hash"].n_docs == rows["cluster_aware"].n_docs
    assert rows["hash"].n_clusters == rows["cluster_aware"].n_clusters


def test_retention_sweep_monotone_in_policy(spark, sf_dir):
    """A longer retention window can only delete LESS: deletable_rows
    is non-increasing in retention_days per event type; deletable never
    exceeds total; ppm valid."""
    from adhesive_spark.queries.audit_queries import (
        q322_retention_sweep_plan,
    )

    rows = q322_retention_sweep_plan(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.retention_days] = r
    assert by_type
    for t, pol in by_type.items():
        assert set(pol) == {30, 90, 365}
        assert (
            pol[30].deletable_rows
            >= pol[90].deletable_rows
            >= pol[365].deletable_rows
        ), t
        for r in pol.values():
            assert 0 <= r.deletable_rows <= r.n_rows
            assert 0 <= r.deletable_ppm <= 1_000_000


def test_staleness_percentiles_ordered(spark, sf_dir):
    """p50 <= p95 <= max; lookups positive; percentile buckets bounded
    by the max bucket."""
    from adhesive_spark.queries.audit_queries import (
        q323_feature_staleness_audit,
    )

    r = q323_feature_staleness_audit(spark, sf_dir).collect()[0]
    assert r.n_lookups > 0
    assert 0 <= r.p50_stale_min <= r.p95_stale_min <= r.max_stale_min


def test_length_bias_rows_conserve(spark, sf_dir):
    """Octave rows partition the corpus (sum == the octave-0 overall
    row); keep rates valid; overall keep rate >= 50% (ties-inclusive
    median gate)."""
    from adhesive_spark.queries.audit_queries import q324_filter_length_bias

    rows = q324_filter_length_bias(spark, sf_dir).collect()
    overall = [r for r in rows if r.octave == 0][0]
    octs = [r for r in rows if r.octave != 0]
    assert sum(r.n_docs for r in octs) == overall.n_docs
    assert sum(r.kept for r in octs) == overall.kept
    assert overall.kept * 2 >= overall.n_docs
    for r in rows:
        assert 0 <= r.keep_ppm <= 1_000_000


def test_multiprobe_dominates_single(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe, so at
    every rank the multiprobe sim must be >= the single-probe sim for
    the same query; multiprobe returns at least as many rows."""
    from adhesive_spark.queries.audit_queries import q325_multiprobe_lsh

    rows = q325_multiprobe_lsh(spark, sf_dir).collect()
    single = {(r.query_id, r.rank): r.sim for r in rows if r.mode == "single"}
    multi = {(r.query_id, r.rank): r.sim for r in rows if r.mode == "multiprobe"}
    assert len(multi) >= len(single) > 0
    for key, s_sim in single.items():
        assert key in multi
        assert multi[key] >= s_sim, key


def test_hubness_histogram_conserves_mass(spark, sf_dir):
    """Histogram conservation: Σ n_vectors = vectors audited and
    Σ n_k·n_vectors = 5·vectors (every top-5 slot lands somewhere);
    max_occ equals the histogram's largest n_k."""
    from adhesive_spark.queries.audit_queries import q326_hubness_audit

    rows = q326_hubness_audit(spark, sf_dir).collect()
    n_total = sum(r.n_vectors for r in rows)
    assert n_total > 0
    assert sum(r.n_k * r.n_vectors for r in rows) == 5 * n_total
    assert max(r.n_k for r in rows) == rows[0].max_occ


def test_hll_ladder_p6_matches_q241_estimator(spark, sf_dir):
    """The ladder's p=6 row must EQUAL the canonical q241 sketch's
    estimate (same hash, same registers, same estimator), and register
    occupancy is bounded by 2^p."""
    from adhesive_spark.operators.sketches import hll_estimate
    from adhesive_spark.queries.audit_queries import q327_hll_precision_ladder

    rows = {r.p: r for r in q327_hll_precision_ladder(spark, sf_dir).collect()}
    assert set(rows) == {4, 5, 6}
    li = load_table(spark, sf_dir, "lineitem")
    canon = hll_estimate(li, "l_orderkey").collect()[0]
    assert rows[6].est_hll == canon.est_hll
    for p, r in rows.items():
        assert r.m == 1 << p
        assert 0 < r.nonempty <= r.m
        assert r.est_hll > 0 and r.exact > 0


def test_cms_ladder_depth_and_width_dominance(spark, sf_dir):
    """CMS estimates upper-bound truth (overcount >= 0 everywhere);
    more depth at equal width can only reduce overcount (min over a
    superset of rows), and 4x width strictly dominates at equal depth
    on this collision-heavy key space."""
    from adhesive_spark.queries.audit_queries import q328_cms_geometry_ladder

    rows = {(r.depth, r.width): r for r in
            q328_cms_geometry_ladder(spark, sf_dir).collect()}
    assert set(rows) == {(2, 16), (4, 16), (4, 64)}
    n = rows[(2, 16)].n_keys
    for r in rows.values():
        assert r.n_keys == n
        assert r.overcount_total >= 0
        assert r.max_overcount_ppm >= 0
    assert rows[(4, 16)].overcount_total <= rows[(2, 16)].overcount_total
    assert rows[(4, 64)].overcount_total <= rows[(4, 16)].overcount_total


def test_sample_size_planner_python_replay(spark, sf_dir):
    """Exact replay: integer sample variance and Lehr ceiling division
    recomputed in straight-line Python over collected cents."""
    from adhesive_spark.queries.audit_queries import (
        q329_ab_sample_size_planner,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("c"))
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.c)
    want = {}
    for t, cs in by_type.items():
        n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        var = (n * s2 - s1 * s1) // (n * (n - 1))
        for d in (10, 50, 100):
            want[(t, d)] = (n, var, (16 * var + d * d - 1) // (d * d))
    got = {
        (r.event_type, r.delta_c): (r.n_obs, r.var_c2, r.needed_per_arm)
        for r in q329_ab_sample_size_planner(spark, sf_dir).collect()
    }
    assert got == want
    # smaller detectable delta needs more samples
    for t in by_type:
        assert got[(t, 10)][2] >= got[(t, 50)][2] >= got[(t, 100)][2]


def test_nprobe_ladder_monotone(spark, sf_dir):
    """Recall is non-decreasing in n_probe (candidate supersets) and
    valid ppm; n_truth constant across rungs."""
    from adhesive_spark.queries.audit_queries import q330_ivf_nprobe_ladder

    rows = {r.n_probe: r for r in q330_ivf_nprobe_ladder(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 4, 8}
    nt = rows[1].n_truth
    last = -1
    for np_ in (1, 2, 4, 8):
        r = rows[np_]
        assert r.n_truth == nt
        assert 0 <= r.hits <= nt
        assert r.recall_ppm >= last
        last = r.recall_ppm


def test_isotropy_matches_bruteforce_pairwise(spark, sf_dir):
    """The closed-form mean pairwise cosine must equal the O(n²)
    brute-force mean over the quantized unit vectors (computed in
    integer Python on a collected sample-safe corpus)."""
    import math

    from adhesive_spark.queries.audit_queries import q331_isotropy_audit

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("embedding")
        .collect()
    )
    qs = []
    for r in rows:
        v = [float(x) for x in r.embedding]
        nrm = math.sqrt(sum(x * x for x in v))
        qs.append([int(round(x / nrm * 1_000_000)) for x in v])
    n = len(qs)
    tot = 0
    s1 = [0] * len(qs[0])
    ssq = 0
    for q in qs:
        for d, x in enumerate(q):
            s1[d] += x
        ssq += sum(x * x for x in q)
    num = sum(s * s for s in s1) - ssq
    den = n * (n - 1) * 1_000_000
    # Spark div / DuckDB // truncate toward zero; Python // floors
    want = abs(num) // den * (1 if num >= 0 else -1)
    got = q331_isotropy_audit(spark, sf_dir).collect()[0]
    assert got.n_vecs == n
    assert got.mean_pair_cos_ppm == want
    assert 0 < got.top_dim_var_ppm < 1_000_000
    assert got.n_dims == 64


def test_index_ledger_scales_with_counts(spark, sf_dir):
    """Ledger arithmetic: per-doc/vec structures price exactly from
    the counted inputs; flat sketches are always broadcastable."""
    from adhesive_spark.queries.audit_queries import q332_index_cost_ledger

    rows = {r.structure: r for r in q332_index_cost_ledger(spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert rows["minhash_signatures"].bytes_est == n_docs * 64 * 8
    assert rows["ivf_assignment"].n_rows == n_vecs
    assert rows["hll_registers"].broadcastable == 1
    assert rows["cms_counters"].broadcastable == 1
    for r in rows.values():
        assert r.bytes_est > 0 and r.n_rows > 0


def test_ingest_dedup_pressure_conserves(spark, sf_dir):
    """Deciles partition the corpus; first decile has the FEWEST dup
    hits of any decile (firsts concentrate early); dup total equals
    corpus minus distinct fingerprints."""
    from adhesive_spark.queries.audit_queries import (
        q333_ingest_dedup_pressure,
    )
    from adhesive_spark.operators.text import fingerprint

    rows = q333_ingest_dedup_pressure(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    n_fp = docs.select(fingerprint(F.col("text")).alias("f")).distinct().count()
    assert sum(r.n_docs for r in rows) == n
    assert sum(r.n_dups for r in rows) == n - n_fp
    by_dec = {r.decile: r for r in rows}
    assert by_dec[0].n_dups <= max(r.n_dups for r in rows)


def test_perm_ladder_more_perms_less_error(spark, sf_dir):
    """More permutations can only help ON AVERAGE: mean absolute
    estimation error is non-increasing 16 -> 32 -> 64 on the real pair
    set; all errors bounded by 1e6."""
    from adhesive_spark.queries.audit_queries import q334_minhash_perm_ladder

    rows = {r.p: r for r in q334_minhash_perm_ladder(spark, sf_dir).collect()}
    assert set(rows) == {16, 32, 64}
    n = rows[16].n_pairs
    assert n > 0 and all(r.n_pairs == n for r in rows.values())
    assert (
        rows[64].mean_abs_err_ppm
        <= rows[32].mean_abs_err_ppm
        <= rows[16].mean_abs_err_ppm
    )
    for r in rows.values():
        assert 0 <= r.mean_abs_err_ppm <= r.max_abs_err_ppm <= 1_000_000
