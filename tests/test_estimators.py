"""Invariant tests for the q359+ estimation & infrastructure-calibration
family (queries/estimator_queries.py) — each pins the STATISTICAL
contract of a query with an independent pure-Python replay or a
closed-form identity, so a refactor that keeps the oracle in sync but
breaks the semantics still fails."""

from collections import Counter

from pyspark.sql import functions as F

from adhesive_spark.queries import estimator_queries as E
from adhesive_spark.sources.registry import load_table


def _doc_tokens(spark, sf_dir):
    """Python replay of the house tokenization (normalize + split)."""
    import re

    rows = load_table(spark, sf_dir, "documents").select(
        "source", "text", "n_chars", "doc_id"
    ).collect()
    out = []
    for r in rows:
        norm = re.sub(r"\s+", " ", r.text.lower()).strip()
        out.append((r.source, norm.split(" "), r.n_chars, r.doc_id))
    return out


def test_chao1_python_replay(spark, sf_dir):
    """Chao1 and Turing coverage match an independent Counter replay;
    chao1 >= s_obs always (the correction only adds)."""
    docs = _doc_tokens(spark, sf_dir)
    per_src: dict[str, Counter] = {}
    for src, toks, _, _ in docs:
        per_src.setdefault(src, Counter()).update(toks)
    out = {r.source: r for r in E.q359_chao1_richness(spark, sf_dir).collect()}
    assert set(out) == set(per_src)
    for src, cnt in per_src.items():
        r = out[src]
        n = sum(cnt.values())
        f1 = sum(1 for v in cnt.values() if v == 1)
        f2 = sum(1 for v in cnt.values() if v == 2)
        assert r.n_tokens == n and r.s_obs == len(cnt)
        assert r.f1 == f1 and r.f2 == f2
        assert r.chao1 == len(cnt) + (f1 * (f1 - 1)) // (2 * (f2 + 1))
        assert r.chao1 >= r.s_obs
        assert r.coverage_ppm == (n - f1) * 1_000_000 // max(n, 1)


def test_kish_ess_bounds_and_replay(spark, sf_dir):
    """1 <= ESS <= n always (Kish); exact replay of the integer math."""
    rows = E.q360_kish_ess(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    per = {}
    for d in docs:
        s = per.setdefault(d.source, [0, 0, 0])
        s[0] += 1
        s[1] += d.n_chars
        s[2] += d.n_chars * d.n_chars
    for r in rows:
        n, sw, sww = per[r.source]
        assert (r.n_docs, r.sw, r.sww) == (n, sw, sww)
        assert r.ess_milli == sw * sw * 1000 // max(sww, 1)
        assert r.ess_share_ppm == sw * sw * 1_000_000 // max(sww * n, 1)
        assert 1000 <= r.ess_milli <= n * 1000
        assert r.ess_share_ppm <= 1_000_000


def test_tv_distance_python_replay_and_bounds(spark, sf_dir):
    """TV in [0, 1]; the reported top pair matches a brute-force
    replay over Counters (same floor arithmetic)."""
    docs = _doc_tokens(spark, sf_dir)
    per_src: dict[str, Counter] = {}
    for src, toks, _, _ in docs:
        per_src.setdefault(src, Counter()).update(toks)
    rows = E.q361_tv_distance(spark, sf_dir).collect()
    assert rows and all(0 <= r.tv_ppm <= 1_000_000 for r in rows)

    def tv_ppm(a, b):
        ca, cb = per_src[a], per_src[b]
        na, nb = sum(ca.values()), sum(cb.values())
        num = sum(
            abs(ca.get(w, 0) * nb - cb.get(w, 0) * na)
            for w in set(ca) | set(cb)
        )
        return num * 1_000_000 // (2 * na * nb)

    for r in rows[:3]:
        assert r.tv_ppm == tv_ppm(r.src_a, r.src_b)
    # top row really is the max over ALL pairs
    srcs = sorted(per_src)
    best = max(
        tv_ppm(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]
    )
    assert rows[0].tv_ppm == best


def test_concentration_identities(spark, sf_dir):
    """HHI >= 1/n_sources (uniform floor) and inverse-Simpson effective
    sources <= n_sources; top share consistent with HHI >= share²."""
    for r in E.q362_source_concentration(spark, sf_dir).collect():
        assert r.hhi_ppm >= 1_000_000 // r.n_sources
        assert r.eff_sources_milli <= r.n_sources * 1000 + 1
        # HHI dominates the top source's squared share
        assert r.hhi_ppm >= r.top_share_ppm**2 // 1_000_000


def test_bloom_monotonicity_and_exact_zero_k_saturation(spark, sf_dir):
    """More bits -> fewer false positives at fixed k; fill decreases in
    m; measured FPR is sane (<= 10^6) and k=4 never beats k=2 on fill."""
    rows = {(r.m_bits, r.k): r for r in
            E.q363_bloom_geometry(spark, sf_dir).collect()}
    assert len(rows) == len(E._BF_GRID)
    for k in (2, 4):
        fprs = [rows[(m, k)].measured_fpr_ppm for m in (4096, 16384, 65536)]
        assert fprs == sorted(fprs, reverse=True)
        fills = [rows[(m, k)].fill_ppm for m in (4096, 16384, 65536)]
        assert fills == sorted(fills, reverse=True)
    for m in (4096, 16384, 65536):
        assert rows[(m, 4)].fill_ppm >= rows[(m, 2)].fill_ppm
        assert rows[(m, 2)].bits_set <= min(m, 2 * rows[(m, 2)].n_members)
        assert rows[(m, 4)].bits_set <= min(m, 4 * rows[(m, 4)].n_members)


def test_reshard_churn_theory_gap(spark, sf_dir):
    """HRW churn sits near the 1/17 floor; mod-N churn is an order of
    magnitude worse (≈16/17); both are valid probabilities."""
    r = E.q364_reshard_churn(spark, sf_dir).collect()[0]
    assert 0 <= r.hrw_churn_ppm <= 1_000_000
    assert r.hrw_churn_ppm < 3 * r.theory_min_ppm  # near 1/17, not 1
    assert r.mod_churn_ppm > 10 * r.hrw_churn_ppm
    assert r.mod_moved <= r.n_docs and r.hrw_moved <= r.n_docs


def test_rendezvous_bucket_stability_property(spark):
    """THE rendezvous property on a toy table: growing 4 -> 5 buckets
    only ever moves keys INTO the new bucket 4 — no key moves between
    old buckets."""
    from adhesive_spark.operators.skew import rendezvous_bucket

    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    out = df.select(
        rendezvous_bucket(F.col("k"), 4).alias("b4"),
        rendezvous_bucket(F.col("k"), 5).alias("b5"),
    ).collect()
    moved = [r for r in out if r.b4 != r.b5]
    assert moved, "some keys must move"
    assert all(r.b5 == 4 for r in moved)
    # and the stayers keep their exact bucket
    assert all(r.b4 == r.b5 for r in out if r.b5 != 4)


def test_runs_test_python_replay(spark, sf_dir):
    """Runs/n1/n2 match a pure-Python scan in doc_id order; the
    detrended identity n = n1 + n2 holds."""
    docs = sorted(_doc_tokens(spark, sf_dir), key=lambda t: t[3])
    out = {r.source: r for r in E.q365_runs_test(spark, sf_dir).collect()}
    per_src: dict[str, list[int]] = {}
    for src, _, n_chars, _ in docs:
        per_src.setdefault(src, []).append(n_chars)
    for src, xs in per_src.items():
        ordered = sorted(xs)
        n = len(ordered)
        med = ordered[(n + 1) // 2 - 1]  # lower median
        signs = [1 if x > med else 0 for x in xs if x != med]
        if not signs:
            assert src not in out
            continue
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        r = out[src]
        assert (r.n, r.n1, r.n2, r.runs) == (
            len(signs), sum(signs), len(signs) - sum(signs), runs
        )
        assert r.n == r.n1 + r.n2


def test_ngram_novelty_disjoint_vs_shared(spark):
    """Two disjoint sources are 100% novel; adding a third source that
    copies one of them collapses that source's novelty to 0."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [("s1", a), ("s2", b), ("s3", a)], ["source", "text"]
    )
    from adhesive_spark.operators.dedup import word_shingles

    grams = (
        df.select("source", F.explode(word_shingles(F.col("text"), 5)).alias("g"))
        .distinct()
    )
    per_gram = grams.groupBy("g").agg(F.count("*").alias("n_src"))
    nov = {
        r.source: (r.novel, r.total)
        for r in grams.join(per_gram, "g")
        .groupBy("source")
        .agg(
            F.count_if(F.col("n_src") == 1).alias("novel"),
            F.count("*").alias("total"),
        )
        .collect()
    }
    assert nov["s2"][0] == nov["s2"][1]  # fully novel
    assert nov["s1"][0] == 0 and nov["s3"][0] == 0  # mutual copies


def test_decile_lift_identities(spark, sf_dir):
    """Deciles partition the corpus; cum_capture is monotone ending at
    10^6; Σ n_docs = corpus size; Σ positives = gate failures; the
    docs-weighted mean lift is 10^6 by construction."""
    rows = E.q367_decile_lift(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    pos = docs.where("n_chars < 100 OR n_chars > 20000").count()
    assert sum(r.n_docs for r in rows) == n
    assert sum(r.positives for r in rows) == pos
    caps = [r.cum_capture_ppm for r in rows]
    assert caps == sorted(caps) and caps[-1] == 1_000_000
    assert rows[-1].cum_pos == pos
    # bottom decile must concentrate failures at least at base rate
    assert rows[0].lift_ppm >= 1_000_000 or rows[0].positives == 0


def test_jl_distortion_numpy_replay(spark, sf_dir):
    """agg ratio matches a numpy replay of the same sign matrix, pair
    spine, and integer floors; the unbiasedness band holds loosely."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").collect()
    mv = {
        r.vec_id: np.array(
            [int(round(float(x) * 1000)) for x in r.embedding], dtype=object
        )
        for r in emb
    }
    S = np.array(E._JL_S, dtype=object)
    pv = {k: S @ v for k, v in mv.items()}
    d2s = p2s = 0
    n_pairs = 0
    for vid in mv:
        for delta in (1, 7, 31):
            if vid + delta in mv:
                d2 = int(((mv[vid] - mv[vid + delta]) ** 2).sum())
                if d2 == 0:
                    continue
                p2 = int(((pv[vid] - pv[vid + delta]) ** 2).sum())
                d2s += d2
                p2s += p2
                n_pairs += 1
    r = E.q368_jl_distortion(spark, sf_dir).collect()[0]
    assert r.n_pairs == n_pairs
    assert r.agg_ratio_ppm == p2s * 1_000_000 // (16 * d2s)
    assert 600_000 < r.agg_ratio_ppm < 1_400_000  # concentration
    assert r.min_ratio_ppm <= r.agg_ratio_ppm <= r.max_ratio_ppm


def test_contribution_bounding_identities(spark, sf_dir):
    """Clipping never increases the total; at most ~5% of users are
    clipped (p95 cap); cap <= max; loss ppm consistent."""
    for r in E.q369_contribution_bounding(spark, sf_dir).collect():
        assert r.clipped_total_cents <= r.total_cents
        assert r.cap_cents <= r.max_user_cents
        assert r.n_clipped * 20 <= r.n_users + 20  # <= ~5% + slack
        assert r.clip_loss_ppm == (
            (r.total_cents - r.clipped_total_cents) * 1_000_000
            // r.total_cents
        )
        assert r.top_share_ppm * r.n_users >= 1_000_000  # max >= mean


def test_hash_uniformity_python_replay(spark, sf_dir):
    """X² matches a hashlib replay; the closed form equals the
    definitional Σ(O−E)²/E over all 64 buckets."""
    import hashlib
    import re

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    fps = {
        hashlib.md5(
            re.sub(r"\s+", " ", r.text.lower()).strip().encode()
        ).hexdigest()
        for r in docs
    }
    buckets = Counter(
        int(hashlib.md5(f"bk:{fp}".encode()).hexdigest()[:8], 16) % 64
        for fp in fps
    )
    n = len(fps)
    sum_o2 = sum(v * v for v in buckets.values())
    r = E.q370_hash_uniformity(spark, sf_dir).collect()[0]
    assert r.n_keys == n
    assert r.max_bucket == max(buckets.values())
    assert r.min_bucket == min(
        buckets.get(b, 0) for b in range(64)
    )
    assert r.chi2_milli == (64 * sum_o2 * 1000 - n * n * 1000) // n
    # definitional replay (float): within one milli of the exact form
    e = n / 64
    chi2 = sum(
        (buckets.get(b, 0) - e) ** 2 / e for b in range(64)
    )
    assert abs(r.chi2_milli - round(chi2 * 1000)) <= 1


def test_dow_seasonality_weighted_mean_is_unity(spark, sf_dir):
    """Event-weighted mean of the index is 1 by construction; all 7
    weekdays appear (30-day window)."""
    rows = E.q371_dow_seasonality(spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == list(range(7))
    n = sum(r.n_events for r in rows)
    weighted = sum(r.index_ppm * r.n_events for r in rows)
    assert abs(weighted / n - 1_000_000) < 100  # floor error only


def test_decile_psi_self_is_zero(spark):
    """A source that IS the corpus scores ~0; a shifted source scores
    strictly more."""
    rows = [("all", i % 100 + 1) for i in range(400)]
    rows += [("hi", 90 + i % 10) for i in range(40)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])

    # inline the query core against this frame via a temp swap
    import adhesive_spark.queries.estimator_queries as q

    real_load = q.load_table
    try:
        q.load_table = lambda spark, sf_dir, name: df
        out = {r.source: r.chi2d_ppm
               for r in q.q372_decile_psi(spark, "ignored").collect()}
    finally:
        q.load_table = real_load
    assert out["hi"] > out["all"]
    # 'all' dominates the corpus, so its drift from corpus is small
    assert out["all"] < 100_000


def test_median_of_means_bounds(spark, sf_dir):
    """MoM lies between the extreme bucket means; identities hold."""
    r = E.q373_median_of_means(spark, sf_dir).collect()[0]
    assert r.bucket_mean_min <= r.mom_cents <= r.bucket_mean_max
    assert r.bucket_mean_min <= r.global_mean_cents <= r.bucket_mean_max
    assert r.global_mean_cents == r.total_cents // r.n_events
    assert r.dev_ppm == abs(r.mom_cents - r.global_mean_cents) \
        * 1_000_000 // max(r.global_mean_cents, 1)


def test_birthday_collisions_python_replay(spark, sf_dir):
    """Colliding-pair counts match a hashlib replay at every rung, and
    collisions can only DECREASE as b grows."""
    import hashlib
    import re

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    fps = {
        hashlib.md5(
            re.sub(r"\s+", " ", r.text.lower()).strip().encode()
        ).hexdigest()
        for r in docs
    }
    hs = [
        int(hashlib.md5(f"bd:{fp}".encode()).hexdigest()[:8], 16)
        for fp in fps
    ]
    rows = {r.b: r for r in
            E.q374_birthday_collisions(spark, sf_dir).collect()}
    prev = None
    for b in (16, 20, 24):
        slots = Counter(h % (1 << b) for h in hs)
        pairs = sum(c * (c - 1) // 2 for c in slots.values())
        assert rows[b].colliding_pairs == pairs
        assert rows[b].n_keys == len(fps)
        if prev is not None:
            assert rows[b].colliding_pairs <= prev
        prev = rows[b].colliding_pairs


def test_lorenz_identities(spark, sf_dir):
    """Lorenz curve is convex-increasing ending at 10^6; decile revenue
    shares are nondecreasing (ascending deciles); totals reconcile."""
    rows = E.q375_lorenz_deciles(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_cust for r in rows) == n_cust
    lz = [r.lorenz_ppm for r in rows]
    assert lz == sorted(lz) and lz[-1] == 1_000_000
    shares = [r.share_ppm for r in rows]
    assert shares == sorted(shares)  # ascending deciles earn more
    # Lorenz lies below the diagonal (inequality exists or equality)
    for i, r in enumerate(rows[:-1], start=1):
        assert r.lorenz_ppm <= i * 100_000 + 1


def test_topk_stability_python_replay(spark, sf_dir):
    """Exact hashlib replay of both top-100 lists (count DESC, token
    ASC tie-break), the overlap, the Jaccard, and the recovered-mass
    share."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    import re as _re

    def toks(t):
        return _re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    full_c: Counter = Counter()
    half_c: Counter = Counter()
    for d in docs:
        ws = toks(d.text)
        full_c.update(ws)
        h = int(
            hashlib.md5(f"tk:{d.doc_id}".encode()).hexdigest()[:8], 16
        )
        if h % 2 == 0:
            half_c.update(ws)

    def top100(c):
        return [
            w for w, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        ][:100]

    full_k, half_k = top100(full_c), set(top100(half_c))
    overlap = sum(1 for w in full_k if w in half_k)
    union = len(full_k) + len(half_k) - overlap  # lists may be < k
    r = E.q376_topk_sample_stability(spark, sf_dir).collect()[0]
    assert r.overlap == overlap
    assert r.jaccard_ppm == overlap * 1_000_000 // union
    full_mass = sum(full_c[w] for w in full_k)
    rec_mass = sum(full_c[w] for w in full_k if w in half_k)
    assert r.mass_recovered_ppm == rec_mass * 1_000_000 // full_mass


def test_simpson_reversal_python_replay(spark, sf_dir):
    """Covariance-numerator signs match a pure-Python replay per source
    and pooled."""
    import re

    docs = load_table(spark, sf_dir, "documents").collect()
    from adhesive_spark.operators.text import quality_score, scaled_long

    scored = (
        load_table(spark, sf_dir, "documents")
        .select(
            "source",
            F.col("n_chars").alias("x"),
            scaled_long(quality_score(F.col("text")), 4).alias("y"),
        )
        .collect()
    )
    per: dict[str, list] = {}
    for r in scored:
        per.setdefault(r.source, []).append((r.x, r.y))
    pn = sum(len(v) for v in per.values())
    psx = sum(x for v in per.values() for x, _ in v)
    psy = sum(y for v in per.values() for _, y in v)
    psxy = sum(x * y for v in per.values() for x, y in v)
    pooled_sign = (pn * psxy - psx * psy > 0) - (pn * psxy - psx * psy < 0)
    out = {r.source: r for r in
           E.q377_simpson_reversal(spark, sf_dir).collect()}
    for src, v in per.items():
        n = len(v)
        sx = sum(x for x, _ in v)
        sy = sum(y for _, y in v)
        sxy = sum(x * y for x, y in v)
        num = n * sxy - sx * sy
        sign = (num > 0) - (num < 0)
        assert out[src].src_sign == sign
        assert out[src].pooled_sign == pooled_sign
        assert out[src].reversed == int(sign * pooled_sign == -1)


def test_wip_profile_python_replay(spark, sf_dir):
    """Peak/mean WIP match a brute-force day-scan; Little's-law algebra
    holds on the shipped integers (area = Σ open-days exactly)."""
    orders = load_table(spark, sf_dir, "orders").collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("e"))
        .collect()
    )
    import datetime

    epoch = datetime.date(1990, 1, 1)
    ends = {r.l_orderkey: (r.e.date() - epoch).days for r in li}
    spans = [
        ((r.o_orderdate.date() - epoch).days, ends[r.o_orderkey])
        for r in orders
        if r.o_orderkey in ends
    ]
    from collections import Counter

    delta = Counter()
    for s, e in spans:
        delta[s] += 1
        delta[e + 1] -= 1
    days = sorted(delta)
    wip, area, peak, peak_day = 0, 0, -1, None
    for i, d in enumerate(days):
        wip += delta[d]
        nxt = days[i + 1] if i + 1 < len(days) else d + 1
        area += wip * (nxt - d)
        if wip > peak:
            peak, peak_day = wip, d
    r = E.q378_wip_profile(spark, sf_dir).collect()[0]
    assert r.n_orders == len(spans)
    assert r.peak_wip == peak
    assert r.peak_day_off == peak_day - days[0]
    assert r.wip_day_area == area
    assert r.wip_day_area == sum(e - s + 1 for s, e in spans)
    assert r.mean_wip_milli == area * 1000 // (days[-1] - days[0])


def test_fulfillment_hazard_python_replay(spark, sf_dir):
    """Cumulative hazard at every ladder rung matches a pure-Python
    Nelson-Aalen with right-censoring at the horizon; monotone in t."""
    orders = load_table(spark, sf_dir, "orders").collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("e"))
        .collect()
    )
    import datetime

    epoch = datetime.date(1990, 1, 1)
    ends = {r.l_orderkey: (r.e.date() - epoch).days for r in li}
    spans = [
        (
            1 if r.o_orderstatus == "F" else 0,
            (r.o_orderdate.date() - epoch).days,
            ends[r.o_orderkey],
        )
        for r in orders
        if r.o_orderkey in ends
    ]
    hmax = max(e for _, _, e in spans)
    durs = [
        (e - s if ev else hmax - s, ev) for ev, s, e in spans
    ]
    from collections import Counter

    d_at = Counter()
    all_at = Counter()
    for t, ev in durs:
        all_at[t] += 1
        d_at[t] += ev
    n0 = len(durs)
    h = 0
    haz_at = {}
    removed = 0
    for t in sorted(all_at):
        at_risk = n0 - removed
        h += d_at[t] * 1_000_000 // at_risk
        haz_at[t] = h
        removed += all_at[t]
    rows = {r.t_max: r.cum_hazard_ppm for r in
            E.q379_fulfillment_hazard(spark, sf_dir).collect()}
    for t_max in (7, 14, 30, 60, 90):
        expect = max(
            (v for t, v in haz_at.items() if t <= t_max), default=None
        )
        if expect is None:
            assert t_max not in rows
        else:
            assert rows[t_max] == expect
    vals = [rows[t] for t in sorted(rows)]
    assert vals == sorted(vals)


def test_eb_shrinkage_contracts(spark, sf_dir):
    """Shrinkage always moves raw means TOWARD the grand mean, never
    past it; larger sources move less (per unit of distance); k is
    shared and positive."""
    rows = E.q380_eb_shrinkage(spark, sf_dir).collect()
    ks = {r.k_milli for r in rows}
    assert len(ks) == 1 and ks.pop() > 0
    docs = load_table(spark, sf_dir, "documents")
    from adhesive_spark.operators.text import quality_score, scaled_long

    g = (
        docs.select(scaled_long(quality_score(F.col("text")), 4).alias("q"))
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    grand_q4 = g.s // g.n
    for r in rows:
        lo, hi = sorted((r.raw_mean_q4, grand_q4))
        # floor arithmetic can undershoot by 1 at the boundaries
        assert lo - 1 <= r.shrunk_mean_q4 <= hi + 1
        if r.raw_mean_q4 > grand_q4:
            assert r.shift_q4 <= 0
        elif r.raw_mean_q4 < grand_q4:
            assert r.shift_q4 >= 0


def test_ratio_estimator_beats_expansion_here(spark, sf_dir):
    """Tokens are ~linear in chars, so the ratio estimator's error must
    be well under the expansion estimator's (the Cochran condition);
    identities on the sample sums hold."""
    r = E.q381_ratio_estimator(spark, sf_dir).collect()[0]
    assert 0 < r.n_sample < r.n_docs
    assert r.err_ratio_ppm <= r.err_expansion_ppm
    assert r.t_hat_ratio > 0 and r.t_hat_expansion > 0


def test_design_effect_decomposition(spark, sf_dir):
    """SSW + SSB reconciles to SST up to per-term floors; deff and
    between-share partition ~unity; deff in (0, 1]."""
    r = E.q382_design_effect(spark, sf_dir).collect()[0]
    slack = r.n_strata + 2  # one floor per term
    assert abs(r.sst_scaled - r.ssw_scaled - r.ssb_scaled) <= 2 * slack
    assert 0 < r.deff_ppm <= 1_000_001
    assert abs(r.deff_ppm + r.between_share_ppm - 1_000_000) < 5_000


def test_load_factor_identities(spark, sf_dir):
    """Load factor <= 10^6 (mean <= peak); p95 <= peak; active hours
    within span; mean consistent with totals."""
    r = E.q383_load_factor(spark, sf_dir).collect()[0]
    assert r.active_hours <= r.span_hours
    assert r.p95_hour_events <= r.peak_hour_events
    assert r.load_factor_ppm <= 1_000_000
    assert r.mean_per_hour_milli == r.n_events * 1000 // r.span_hours
    assert r.load_factor_ppm == r.n_events * 1_000_000 // (
        r.span_hours * r.peak_hour_events
    )


def test_priority_slo_python_replay(spark, sf_dir):
    """Median and SLA attainment per priority match a Python replay."""
    orders = load_table(spark, sf_dir, "orders").collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("e"))
        .collect()
    )
    ends = {r.l_orderkey: r.e.date() for r in li}
    per: dict[str, list[int]] = {}
    for o in orders:
        if o.o_orderkey in ends:
            per.setdefault(o.o_orderpriority, []).append(
                (ends[o.o_orderkey] - o.o_orderdate.date()).days
            )
    out = {r.priority: r for r in
           E.q384_priority_slo(spark, sf_dir).collect()}
    assert set(out) == set(per)
    for pri, lats in per.items():
        r = out[pri]
        s = sorted(lats)
        assert r.n_orders == len(s)
        assert r.p50_latency_days == s[(len(s) + 1) // 2 - 1]
        assert r.mean_latency_milli == sum(s) * 1000 // len(s)
        assert r.sla90_ppm == (
            sum(1 for v in s if v <= 90) * 1_000_000 // len(s)
        )


def test_rfm_codes_partition_and_monotone(spark, sf_dir):
    """Segments partition the customer base; every code in 1..5; the
    m=5 row set carries more revenue per customer than m=1."""
    rows = E.q385_rfm_segments(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_cust for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_code <= 5 and 1 <= r.f_code <= 5
        assert 1 <= r.m_code <= 5
    m1 = [(r.segment_cents, r.n_cust) for r in rows if r.m_code == 1]
    m5 = [(r.segment_cents, r.n_cust) for r in rows if r.m_code == 5]
    avg1 = sum(c for c, _ in m1) / max(sum(n for _, n in m1), 1)
    avg5 = sum(c for c, _ in m5) / max(sum(n for _, n in m5), 1)
    assert avg5 > avg1


def test_region_hhi_identities(spark, sf_dir):
    """HHI >= uniform floor; effective suppliers <= actual; revenue
    reconciles with a direct lineitem aggregate."""
    rows = E.q386_region_supply_hhi(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").alias("c")
    )
    total = li.agg(F.sum("c")).collect()[0][0]
    assert sum(r.revenue_cents for r in rows) == total
    for r in rows:
        assert r.hhi_ppm >= 1_000_000 // r.n_suppliers
        assert r.eff_suppliers_milli <= r.n_suppliers * 1000 + 1
        assert r.hhi_ppm >= r.top_share_ppm**2 // 1_000_000


def test_ttr_ladder_monotone_in_budget(spark, sf_dir):
    """TTR is non-increasing in the budget for every source (types
    grow sublinearly in tokens), and ttr <= 1000 always."""
    rows = E.q387_ttr_ladder(spark, sf_dir).collect()
    per: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r.ttr_milli <= 1000
        per.setdefault(r.source, {})[r.budget] = r.ttr_milli
    for src, ladder in per.items():
        vals = [ladder[b] for b in sorted(ladder)]
        # sampled-prefix TTR declines (or ties) as the budget grows;
        # allow 1 milli of floor slack
        assert all(a + 1 >= b for a, b in zip(vals, vals[1:])), (src, vals)


def test_session_gap_sweep_monotone(spark, sf_dir):
    """A larger gap threshold can only MERGE sessions: n_sessions is
    non-increasing in the threshold; every user has >= 1 session."""
    rows = E.q388_session_gap_sweep(spark, sf_dir).collect()
    ns = [r.n_sessions for r in rows]  # ordered by gap_thr_s
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert r.n_sessions >= r.n_users
        assert r.sessions_per_user_milli >= 1000


def test_interarrival_python_replay(spark, sf_dir):
    """Gap count, mean, and both exact quantiles match a Python scan of
    per-customer consecutive order dates."""
    orders = load_table(spark, sf_dir, "orders").collect()
    import datetime

    epoch = datetime.date(1990, 1, 1)
    per: dict[int, list[int]] = {}
    for o in orders:
        per.setdefault(o.o_custkey, []).append(
            (o.o_orderdate.date() - epoch).days
        )
    gaps = []
    for days in per.values():
        s = sorted(days)
        gaps.extend(b - a for a, b in zip(s, s[1:]))
    gaps.sort()
    n = len(gaps)
    r = E.q389_order_interarrival(spark, sf_dir).collect()[0]
    assert r.n_gaps == n
    assert r.mean_gap_days_milli == sum(gaps) * 1000 // n
    # lower quantiles on the value grid == order statistics
    assert r.p50_gap_days == gaps[(n + 1) // 2 - 1]
    assert r.p90_gap_days == gaps[(n * 9 + 9) // 10 - 1]


def test_stride_ladder_closed_form(spark, sf_dir):
    """Stride 64 (no overlap) duplicates nothing; duplicated tokens
    match the closed form against a direct token-count scan; inflation
    is monotone decreasing in stride."""
    rows = {r.stride: r for r in
            E.q390_stride_overlap_ladder(spark, sf_dir).collect()}
    assert rows[64].dup_tokens == 0
    assert rows[64].inflation_ppm == 1_000_000
    infl = [rows[s].inflation_ppm for s in (32, 48, 64)]
    assert infl == sorted(infl, reverse=True)
    docs = _doc_tokens(spark, sf_dir)
    for stride in (32, 48, 64):
        chunks = dup = 0
        for _, toks, _, _ in docs:
            L = len(toks)
            c = 1 if L <= 64 else 1 + -(-(L - 64) // stride)
            chunks += c
            dup += (c - 1) * (64 - stride)
        assert rows[stride].total_chunks == chunks
        assert rows[stride].dup_tokens == dup


def test_delta_encoding_bits_replay(spark, sf_dir):
    """Bit widths match Python bit_length on a replay of the per-type
    sorted gaps; delta bits never exceed raw bits."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("es")
    ).collect()
    per: dict[str, list[int]] = {}
    for r in ev:
        per.setdefault(r.event_type, []).append(r.es)
    out = {r.event_type: r for r in
           E.q391_delta_encoding_roi(spark, sf_dir).collect()}
    for t, vals in per.items():
        s = sorted(vals)
        max_gap = max(b - a for a, b in zip(s, s[1:]))
        r = out[t]
        assert r.n_rows == len(s)
        assert r.max_gap_s == max_gap
        assert r.raw_bits == s[-1].bit_length()
        assert r.delta_bits == max(max_gap, 1).bit_length()
        assert r.delta_bits <= r.raw_bits


def test_cohort_retention_identities(spark, sf_dir):
    """k=0 retention is exactly 10^6 for every cohort (the cohort
    itself orders in its first month); retention <= 10^6 everywhere;
    cohort sizes sum to the customer count."""
    rows = E.q392_cohort_retention(spark, sf_dir).collect()
    k0 = [r for r in rows if r.k == 0]
    assert all(r.retention_ppm == 1_000_000 for r in k0)
    assert all(r.retention_ppm <= 1_000_000 for r in rows)
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.cohort_n for r in k0) == n_cust


def test_partition_planner_conservation(spark, sf_dir):
    """Total bytes identical at every P (hashing only MOVES bytes);
    used partitions <= min(P, n_keys); skew ratio >= 10^6."""
    rows = E.q393_partition_size_planner(spark, sf_dir).collect()
    totals = {r.total_bytes for r in rows}
    assert len(totals) == 1
    n_keys = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.used_partitions <= min(r.p, n_keys)
        assert r.skew_ratio_ppm >= 1_000_000
        assert r.max_partition_bytes * r.used_partitions >= r.total_bytes \
            or r.used_partitions < r.p  # max*used >= total when all used


def test_watermark_planner_python_replay(spark, sf_dir):
    """Late share and p99 match a per-user running-max replay in
    event_id order."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("es"),
    ).collect()
    per: dict[int, list] = {}
    for r in ev:
        per.setdefault(r.user_id, []).append((r.event_id, r.es))
    lates = []
    for rows_u in per.values():
        mx = None
        for _, es in sorted(rows_u):
            lates.append(max((mx - es) if mx is not None else 0, 0))
            mx = es if mx is None else max(mx, es)
    lates.sort()
    n = len(lates)
    r = E.q394_watermark_planner(spark, sf_dir).collect()[0]
    assert r.n_events == n
    assert r.n_late == sum(1 for v in lates if v > 0)
    assert r.max_late_s == lates[-1]
    assert r.p99_late_s == lates[(n * 99 + 99) // 100 - 1]


def test_winsor_impact_monotone(spark, sf_dir):
    """Higher quantile cap -> less clipped, less tail mass removed;
    winsor mean <= raw mean always."""
    rows = {r.q: r for r in E.q395_winsor_impact(spark, sf_dir).collect()}
    assert rows[90].n_clipped >= rows[95].n_clipped >= rows[99].n_clipped
    assert rows[90].tail_mass_ppm >= rows[95].tail_mass_ppm \
        >= rows[99].tail_mass_ppm
    for r in rows.values():
        assert r.winsor_mean_c <= r.mean_c
        assert rows[90].cap_c <= rows[95].cap_c <= rows[99].cap_c


def test_key_cardinality_lattice_monotone(spark, sf_dir):
    """Adding a grouping column can only grow the group count; every
    rung's groups*rows_per_group reconciles with the row count."""
    rows = {r.combo: r for r in
            E.q396_key_cardinality_ladder(spark, sf_dir).collect()}
    assert rows["source,lang"].n_groups >= rows["source"].n_groups
    assert rows["source,lang"].n_groups >= rows["lang"].n_groups
    assert (rows["source,lang,n_chars"].n_groups
            >= rows["source,lang"].n_groups)
    for r in rows.values():
        assert r.rows_per_group_milli == r.n_rows * 1000 // r.n_groups


def test_revenue_bridge_reconciles(spark, sf_dir):
    """delta = mix + rate + resid EXACTLY per segment (the floors are
    shipped); segment sums reconcile with direct period aggregates."""
    rows = E.q397_revenue_bridge(spark, sf_dir).collect()
    for r in rows:
        assert r.delta_cents == r.mix_cents + r.rate_cents + r.resid_cents
        assert abs(r.resid_cents) <= 1  # one floor each side
    orders = load_table(spark, sf_dir, "orders")
    s1 = orders.where("year(o_orderdate) <= 1997").agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)")
    ).collect()[0][0]
    assert sum(r.s1 for r in rows) == s1


def test_zipf_ladder_python_replay(spark, sf_dir):
    """Rank products match a Counter replay with the same tie-break."""
    docs = _doc_tokens(spark, sf_dir)
    c: Counter = Counter()
    for _, toks, _, _ in docs:
        c.update(toks)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    rows = {r.rank: r for r in
            E.q398_zipf_product_ladder(spark, sf_dir).collect()}
    f_top = ranked[0][1]
    for rank in (1, 2, 5, 10, 20, 50, 100):
        if rank > len(ranked):
            assert rank not in rows
            continue
        w, f = ranked[rank - 1]
        r = rows[rank]
        assert (r.token, r.freq) == (w, f)
        assert r.rf_product == rank * f
        assert r.rf_norm_ppm == rank * f * 1_000_000 // f_top


def test_discount_response_identities(spark, sf_dir):
    """Band means are valid; the covariance sign is shared across rows
    and matches a direct replay."""
    rows = E.q399_discount_response(spark, sf_dir).collect()
    signs = {r.cov_sign for r in rows}
    assert len(signs) == 1 and signs.pop() in (-1, 0, 1)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(ROUND(l_discount*100,0) AS BIGINT)").alias("d"),
        F.expr("CAST(ROUND(l_quantity*100,0) AS BIGINT)").alias("q"),
    ).collect()
    n = len(li)
    sd = sum(r.d for r in li)
    sq = sum(r.q for r in li)
    sdq = sum(r.d * r.q for r in li)
    num = n * sdq - sd * sq
    expect = (num > 0) - (num < 0)
    assert rows[0].cov_sign == expect


def test_token_economics_funnel_monotone(spark, sf_dir):
    """The ledger is a funnel: each stage can only remove tokens;
    ratios are consistent with the shipped integers."""
    r = E.q400_token_economics(spark, sf_dir).collect()[0]
    assert (r.raw_tokens >= r.after_len_tokens >= r.after_quality_tokens
            >= r.surviving_tokens >= 0)
    assert r.effective_per_raw_ppm == (
        r.surviving_tokens * 1_000_000 // r.raw_tokens
    )
    assert r.train_inflation_ppm >= 1_000_000
    assert r.train_inflation_ppm == (
        (r.surviving_tokens + r.overlap_tokens) * 1_000_000
        // max(r.surviving_tokens, 1)
    )


def test_dow_anova_decomposition(spark, sf_dir):
    """SSB + SSW ~= SST (per-term floors); eta^2 consistent with the
    shipped sums; F positive."""
    r = E.q401_dow_anova(spark, sf_dir).collect()[0]
    assert r.f_milli > 0 and r.n_groups == 7
    assert r.eta_sq_ppm == r.ssb_scaled * 1_000_000 // (
        r.ssb_scaled + r.ssw_scaled
    )


def test_mix_shift_tv_replay(spark, sf_dir):
    """TV over the categorical mix matches a direct replay from the
    shipped counts; shares sum to ~1e6 per half."""
    rows = E.q402_mix_shift_canary(spark, sf_dir).collect()
    t1 = sum(r.n1 for r in rows)
    t2 = sum(r.n2 for r in rows)
    num = sum(abs(r.n1 * t2 - r.n2 * t1) for r in rows)
    assert rows[0].tv_ppm == num * 1_000_000 // (2 * t1 * t2)
    assert abs(sum(r.share1_ppm for r in rows) - 1_000_000) <= len(rows)
    assert abs(sum(r.share2_ppm for r in rows) - 1_000_000) <= len(rows)


def test_keep_policy_gain_nonnegative(spark, sf_dir):
    """Keep-best can never lose quality vs keep-first; divergence
    implies positive gain on at least one cluster."""
    r = E.q403_keep_policy_divergence(spark, sf_dir).collect()[0]
    assert r.q_gain_total >= 0
    assert 0 <= r.divergent_ppm <= 1_000_000
    if r.divergent == 0:
        assert r.q_gain_total == 0
    assert r.divergent <= r.n_clusters


def test_autoscale_identities(spark, sf_dir):
    """Reactive drops are bounded by the total; static utilization in
    (0, 1]; the first hour is always fully dropped (prov=0)."""
    r = E.q404_autoscale_lag_cost(spark, sf_dir).collect()[0]
    assert 0 < r.dropped_reactive <= r.total_load
    assert 0 < r.static_util_ppm <= 1_000_000
    assert r.dropped_share_ppm == (
        r.dropped_reactive * 1_000_000 // r.total_load
    )


def test_dict_roi_shape(spark, sf_dir):
    """Low-cardinality columns gain, the text column doesn't; byte
    identities replay."""
    rows = {r.column: r for r in
            E.q405_dict_encoding_roi(spark, sf_dir).collect()}
    # source (4-6 char values, 20 distinct) wins; lang is the EDGE the
    # query exists to catch: 2-char values can't beat 2-byte codes, so
    # dictionary encoding LOSES and ROI clamps to 0; all-distinct text
    # gains nothing either
    assert rows["source"].roi_ppm > 300_000
    assert rows["lang"].roi_ppm == 0
    assert rows["lang"].dict_bytes >= rows["lang"].raw_bytes
    assert rows["text"].roi_ppm == 0  # all-distinct text: dict only adds
    for r in rows.values():
        assert r.n_distinct <= r.n_rows


def test_assortativity_sign_replay(spark, sf_dir):
    """Covariance sign matches a Python replay over the distinct
    edge set."""
    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    pdeg: Counter = Counter(e.l_partkey for e in edges)
    sdeg: Counter = Counter(e.l_suppkey for e in edges)
    n = len(edges)
    sx = sum(pdeg[e.l_partkey] for e in edges)
    sy = sum(sdeg[e.l_suppkey] for e in edges)
    sxy = sum(pdeg[e.l_partkey] * sdeg[e.l_suppkey] for e in edges)
    num = n * sxy - sx * sy
    r = E.q406_degree_assortativity(spark, sf_dir).collect()[0]
    assert r.n_edges == n
    assert r.cov_sign == (num > 0) - (num < 0)
    # both engines TRUNCATE integer division toward zero on negatives
    # (verified by the oracle match); Python // floors — emulate trunc
    expect = abs(num) * 1000 // (n * n)
    assert r.cov_milli == (expect if num >= 0 else -expect)


def test_shingle_ladder_monotone(spark, sf_dir):
    """Longer shingles -> fewer candidates and (weakly) higher
    precision; verified <= candidates."""
    rows = {r.shingle_n: r for r in
            E.q407_shingle_size_ladder(spark, sf_dir).collect()}
    assert (rows[2].candidate_pairs >= rows[3].candidate_pairs
            >= rows[5].candidate_pairs)
    for r in rows.values():
        assert r.verified_pairs <= r.candidate_pairs
    assert rows[5].precision_ppm >= rows[2].precision_ppm


def test_quantile_chart_replay(spark, sf_dir):
    """Week-0 drift is 0 by construction; p50 <= p90 everywhere; week
    partition sizes reconcile."""
    rows = E.q408_quantile_control_chart(spark, sf_dir).collect()
    w0 = [r for r in rows if r.week == 0][0]
    assert w0.p50_drift_ppm == 0 and w0.p90_drift_ppm == 0
    for r in rows:
        assert r.p50_c <= r.p90_c
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events


def test_q363_grid_extension_k6_stays_oracle_exact(spark, sf_dir, monkeypatch):
    """Behavioral twin of the r9 ADVICE static guard: extend _BF_GRID
    with a k=6 geometry AT RUNTIME and prove query and oracle still
    agree cell-for-cell.  Under the old hard-coded
    ``generate_series(1, 4)`` spine the oracle would silently use only
    4 of the 6 hash functions for the new geometry and diverge (or
    coincidentally match) — the regenerated oracle must carry the
    grid's max k."""
    import duckdb

    from tools.check_correctness import compare

    monkeypatch.setattr(E, "_BF_GRID", E._BF_GRID + ((4096, 6),))
    sql = E._bloom_oracle()
    assert "generate_series(1, 6)" in sql
    sdf = E.q363_bloom_geometry(spark, sf_dir).toPandas()
    assert len(sdf) == 7  # six base cells + the k=6 extension
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    odf = con.execute(sql).fetchdf()
    problems = compare("q363_k6", sdf, odf)
    assert not problems, problems
