"""Estimation & infrastructure-calibration queries (q359+): the
closed-form estimators and self-audits a 100 TB pipeline runs to price
its own machinery — species-richness extrapolation (Chao1), Kish
effective sample size of importance weights, total-variation distance
between source token distributions (the log-free drift sibling of
KL/PSI), source-concentration indices (HHI / inverse Simpson),
Bloom-filter geometry ladders, consistent-hash resharding churn,
Wald–Wolfowitz ingest-order randomness, n-gram novelty, scorer lift
tables, Johnson–Lindenstrauss distortion, user-contribution bounding
for DP preprocessing, hash-uniformity chi-square, decile-PSI population
stability, median-of-means robustness, and birthday-bound collision
audits for dedup-key sizing.

House conventions (identical to queries/metrology_queries.py): exact
integer arithmetic (ppm/fixed point, division LAST, Spark ``div`` /
DuckDB ``//``), portable md5 hashing, DECIMAL(38,0)/HUGEINT headroom on
products of sums, scalar-only output columns, identical column aliases
in query and oracle, ``ensure_parallelism`` ahead of CPU-dense per-row
passes, ``localCheckpoint`` on collapsed bounded-domain tables.

Reference parity note: the reference engine (milenkovicm/adhesive,
src/fusion.rs) delegates its relational surface to DataFusion and ships
none of this; this module is SURVEY §2.3 extension surface.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adhesive_spark.queries.metrology_queries import _NORM, _TOKS, _h32
from adhesive_spark.sources.registry import load_table

ESTIMATOR_QUERIES: dict = {}
ESTIMATOR_ORACLES: dict = {}


# --- q359: Chao1 vocabulary-richness estimator --------------------------------


def q359_chao1_richness(spark, sf_dir):
    """Chao1 species-richness estimate of each source's TRUE vocabulary
    size (Chao 1984; bias-corrected form Ŝ = S_obs + f₁(f₁−1)/(2(f₂+1)))
    plus the Turing sample-coverage estimate Ĉ = 1 − f₁/n. Where q336
    prices the unseen probability MASS, this extrapolates the unseen
    TYPE count — the "how much vocabulary have we not ingested yet?"
    readout that decides whether crawling a source further still buys
    new tokens. Everything integer: f₁/f₂ are exact frequency-of-
    frequency counts; the correction divides once.

    Scale shape: one corpus pass collapses to (source, token) counts;
    richness is a per-source aggregate over that collapsed table.
    """
    from adhesive_spark.operators.text import tokens
    from adhesive_spark.sources.registry import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per = cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("s_obs"),
        F.count_if(F.col("c") == 1).cast("long").alias("f1"),
        F.count_if(F.col("c") == 2).cast("long").alias("f2"),
    )
    return per.select(
        "source",
        "n_tokens",
        "s_obs",
        "f1",
        "f2",
        F.expr(
            "CAST(s_obs + (f1 * (f1 - 1)) div (2 * (f2 + 1)) AS BIGINT)"
        ).alias("chao1"),
        F.expr(
            "CAST((n_tokens - f1) * 1000000 div greatest(n_tokens, 1)"
            " AS BIGINT)"
        ).alias("coverage_ppm"),
    ).orderBy("source")


ESTIMATOR_QUERIES["q359_chao1_richness"] = q359_chao1_richness

ESTIMATOR_ORACLES["q359_chao1_richness"] = f"""
    WITH tok AS (
      SELECT source, UNNEST({_TOKS}) AS w FROM documents
    ),
    cnt AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    per AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS s_obs,
             CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
             CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS f2
      FROM cnt GROUP BY source
    )
    SELECT source, n_tokens, s_obs, f1, f2,
           CAST(s_obs + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
             AS chao1,
           CAST((n_tokens - f1) * 1000000 // GREATEST(n_tokens, 1)
                AS BIGINT) AS coverage_ppm
    FROM per ORDER BY source
"""


# --- q360: Kish effective sample size of importance weights -------------------


def q360_kish_ess(spark, sf_dir):
    """Kish effective sample size of per-document importance weights
    (Kish 1965: ESS = (Σw)²/Σw²), with document length standing in for
    the importance weight — exactly the degradation a length-weighted
    (token-proportional) sampler pays per source. ess_milli is ESS×1000;
    ess_share_ppm = ESS/n says what fraction of the source's nominal
    sample size survives the weighting — the number that decides whether
    a weighted mixture needs MORE raw documents to hit a variance
    target. Integer-exact: (Σw)² and Σw² are integer; division last with
    DECIMAL(38,0) headroom on the square of the sum.

    Scale shape: one aggregate per source over (w, w²) partial sums —
    a single map-side-combined pass, output is 20 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sw"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sww"),
    )
    return per.select(
        "source",
        "n_docs",
        "sw",
        "sww",
        F.expr(
            "CAST(CAST(sw AS DECIMAL(38,0)) * sw * 1000"
            " div greatest(sww, 1) AS BIGINT)"
        ).alias("ess_milli"),
        F.expr(
            "CAST(CAST(sw AS DECIMAL(38,0)) * sw * 1000000"
            " div greatest(CAST(sww AS DECIMAL(38,0)) * n_docs, 1)"
            " AS BIGINT)"
        ).alias("ess_share_ppm"),
    ).orderBy("source")


ESTIMATOR_QUERIES["q360_kish_ess"] = q360_kish_ess

ESTIMATOR_ORACLES["q360_kish_ess"] = """
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sw,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sww
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, sw, sww,
           CAST(CAST(sw AS HUGEINT) * sw * 1000
                // GREATEST(sww, 1) AS BIGINT) AS ess_milli,
           CAST(CAST(sw AS HUGEINT) * sw * 1000000
                // GREATEST(CAST(sww AS HUGEINT) * n_docs, 1)
                AS BIGINT) AS ess_share_ppm
    FROM per ORDER BY source
"""


# --- q361: total-variation distance between source token distributions --------


def q361_tv_distance(spark, sf_dir):
    """Pairwise total-variation distance between source unigram
    distributions: TV(P,Q) = ½·Σ_w |p_w − q_w| — the log-free,
    integer-exact drift metric (KL and PSI need logarithms; TV bounds
    them both and never diverges on disjoint support). Reported for the
    top-scoring pairs: the "which two sources are really the same
    crawl?" / "which mixture components are redundant?" readout.
    Cross-multiplied form keeps it exact: Σ|c_a·N_b − c_b·N_a| over the
    union vocabulary, divided ONCE by 2·N_a·N_b.

    Scale shape: the corpus collapses to (source, token) counts in one
    pass (checkpointed); per-token source vectors come from ONE more
    aggregate (map_from_entries); the pair term is |pairs| × vocab rows
    against a broadcast 190-row pair spine — never corpus × corpus.
    """
    from adhesive_spark.operators.text import tokens
    from adhesive_spark.sources.registry import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    # 190-row pair spine (20 sources), broadcast everywhere
    pairs = (
        totals.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
        .join(
            totals.select(
                F.col("source").alias("src_b"), F.col("n").alias("n_b")
            ),
            F.col("src_a") < F.col("src_b"),
        )
    )
    # one vector row per token: map source -> count
    vec = cnt.groupBy("w").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("source"), F.col("c")))
        ).alias("m")
    )
    terms = vec.crossJoin(F.broadcast(pairs)).select(
        "src_a",
        "src_b",
        "n_a",
        "n_b",
        F.expr(
            "abs(CAST(coalesce(m[src_a], 0) AS DECIMAL(38,0)) * n_b"
            " - CAST(coalesce(m[src_b], 0) AS DECIMAL(38,0)) * n_a)"
        ).alias("num"),
        F.expr(
            "CAST(coalesce(m[src_a], 0) > 0 OR coalesce(m[src_b], 0) > 0"
            " AS LONG)"
        ).alias("in_union"),
    )
    tv = (
        terms.groupBy("src_a", "src_b", "n_a", "n_b")
        .agg(
            F.sum("num").alias("num"),
            F.sum("in_union").cast("long").alias("union_vocab"),
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "union_vocab",
            F.expr(
                "CAST(num * 1000000"
                " div (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("tv_ppm"),
        )
    )
    # top-20 most-divergent pairs, deterministic tie-break
    return tv.orderBy(
        F.desc("tv_ppm"), F.asc("src_a"), F.asc("src_b")
    ).limit(20)


ESTIMATOR_QUERIES["q361_tv_distance"] = q361_tv_distance

ESTIMATOR_ORACLES["q361_tv_distance"] = f"""
    WITH tok AS (
      SELECT source, UNNEST({_TOKS}) AS w FROM documents
    ),
    cnt AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, w
    ),
    totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.n AS n_a, b.n AS n_b
      FROM totals a JOIN totals b ON a.source < b.source
    ),
    vocab AS (SELECT DISTINCT w FROM cnt),
    grid AS (
      SELECT p.src_a, p.src_b, p.n_a, p.n_b, v.w,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM pairs p CROSS JOIN vocab v
      LEFT JOIN cnt ca ON ca.source = p.src_a AND ca.w = v.w
      LEFT JOIN cnt cb ON cb.source = p.src_b AND cb.w = v.w
    ),
    tv AS (
      SELECT src_a, src_b, n_a, n_b,
             CAST(SUM(CASE WHEN ca > 0 OR cb > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS union_vocab,
             SUM(ABS(CAST(ca AS HUGEINT) * n_b
                     - CAST(cb AS HUGEINT) * n_a)) AS num
      FROM grid GROUP BY src_a, src_b, n_a, n_b
    )
    SELECT src_a, src_b, n_a, n_b, union_vocab,
           CAST(num * 1000000 // (2 * CAST(n_a AS HUGEINT) * n_b)
                AS BIGINT) AS tv_ppm
    FROM tv
    ORDER BY tv_ppm DESC, src_a ASC, src_b ASC
    LIMIT 20
"""


# --- q362: source-concentration indices (HHI / inverse Simpson) ---------------


def q362_source_concentration(spark, sf_dir):
    """Source-mix concentration per language: Herfindahl–Hirschman index
    in ppm (Σ share²), the inverse-Simpson EFFECTIVE number of sources
    (×1000) it implies, and the top source's share — the "is this
    language really diversified, or one crawl wearing twenty names?"
    readout that decides deduplication priorities and mixture caps
    before a 100 TB ingest. Integer-exact: HHI_ppm = Σc²·10⁶ / N²,
    effective sources = N²·1000 / Σc², division last.

    Scale shape: one (lang, source) count aggregate, then a 5-row
    per-language rollup. Nothing touches the corpus twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("c")
    )
    per = cells.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_sources"),
        F.max("c").cast("long").alias("top_c"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    return per.select(
        "lang",
        "n_docs",
        "n_sources",
        F.expr("CAST(top_c * 1000000 div n_docs AS BIGINT)").alias(
            "top_share_ppm"
        ),
        F.expr(
            "CAST(CAST(sc2 AS DECIMAL(38,0)) * 1000000"
            " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"
        ).alias("hhi_ppm"),
        F.expr(
            "CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs * 1000"
            " div greatest(sc2, 1) AS BIGINT)"
        ).alias("eff_sources_milli"),
    ).orderBy("lang")


ESTIMATOR_QUERIES["q362_source_concentration"] = q362_source_concentration

ESTIMATOR_ORACLES["q362_source_concentration"] = """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, source
    ),
    per AS (
      SELECT lang,
             CAST(SUM(c) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(MAX(c) AS BIGINT) AS top_c,
             CAST(SUM(c * c) AS BIGINT) AS sc2
      FROM cells GROUP BY lang
    )
    SELECT lang, n_docs, n_sources,
           CAST(top_c * 1000000 // n_docs AS BIGINT) AS top_share_ppm,
           CAST(CAST(sc2 AS HUGEINT) * 1000000
                // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
             AS hhi_ppm,
           CAST(CAST(n_docs AS HUGEINT) * n_docs * 1000
                // GREATEST(sc2, 1) AS BIGINT) AS eff_sources_milli
    FROM per ORDER BY lang
"""


# --- q363: Bloom-filter geometry ladder ----------------------------------------

#: (m_bits, k) grid — small enough that every bit table broadcasts, wide
#: enough to span under- and over-provisioned filters.
_BF_GRID = ((4096, 2), (4096, 4), (16384, 2), (16384, 4), (65536, 2), (65536, 4))
_BF_PROBES = 5000


def q363_bloom_geometry(spark, sf_dir):
    """Bloom-filter geometry ladder: for each (m bits, k hashes) cell,
    BUILD the filter over the corpus's distinct fingerprints with k
    portable hash functions, PROBE it with 5 000 deterministic
    non-member keys, and ship the measured false-positive rate next to
    the fill-factor prediction FPR ≈ fill^k — the q327/q328 (HLL/CMS)
    precision-ladder sibling for the third workhorse sketch. This is
    the "how many bits does the 100 TB dedup pre-filter actually need?"
    readout (q258 runs ONE geometry in anger; this prices the knob), and
    measuring instead of formula-reading catches exactly the failures
    formulas hide: correlated hash functions, saturated fills.

    Scale shape: members collapse to distinct fingerprints once; each
    bit table is ≤ m rows BY CONSTRUCTION (distinct positions), so the
    probe side joins a broadcast; probes never see the corpus.
    """
    from adhesive_spark.operators.dedup import portable_hash32
    from adhesive_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    # collapsed member set feeds THREE consumers (bits, n_mem) — pin it
    fps = (
        docs.select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    geoms = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("long").alias("m"),
                        F.lit(k).cast("long").alias("k"),
                    )
                    for m, k in _BF_GRID
                ]
            )
        ).alias("g")
    ).select("g.m", "g.k")

    def _pos(key_col):
        # hash h of key -> bit position in [0, m)
        return F.pmod(
            portable_hash32(
                F.concat(
                    F.lit("bf"),
                    F.col("h").cast("string"),
                    F.lit(":"),
                    key_col,
                )
            ),
            F.col("m"),
        )

    hspine = F.explode(F.sequence(F.lit(1), F.col("k"))).alias("h")
    bits = (
        fps.crossJoin(F.broadcast(geoms))
        .select("m", "k", "fp", hspine)
        .select("m", "k", _pos(F.col("fp")).alias("pos"))
        .distinct()
        # ≤ Σm rows by construction; reused by fill AND the probe join
        .localCheckpoint(eager=True)
    )
    fill = bits.groupBy("m", "k").agg(
        F.count("*").cast("long").alias("bits_set")
    )
    probes = spark.range(_BF_PROBES).select(
        F.md5(F.concat(F.lit("probe:"), F.col("id").cast("string"))).alias(
            "pf"
        )
    )
    hits = (
        probes.crossJoin(F.broadcast(geoms))
        .select("m", "k", "pf", hspine)
        .select("m", "k", "pf", _pos(F.col("pf")).alias("pos"))
        .join(
            F.broadcast(bits.select("m", "k", "pos", F.lit(1).alias("hit"))),
            ["m", "k", "pos"],
            "left",
        )
        .groupBy("m", "k", "pf")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    fpr = hits.groupBy("m", "k").agg(
        F.count("*").cast("long").alias("n_probes"),
        F.count_if(F.col("n_hit") == F.col("k")).cast("long").alias(
            "false_pos"
        ),
    )
    n_mem = fps.agg(F.count("*").cast("long").alias("n_members"))
    return (
        fill.join(fpr, ["m", "k"])
        .crossJoin(F.broadcast(n_mem))
        .select(
            F.col("m").alias("m_bits"),
            "k",
            "n_members",
            "bits_set",
            F.expr("CAST(bits_set * 1000000 div m AS BIGINT)").alias(
                "fill_ppm"
            ),
            "n_probes",
            "false_pos",
            F.expr(
                "CAST(false_pos * 1000000 div n_probes AS BIGINT)"
            ).alias("measured_fpr_ppm"),
            F.expr(
                "CAST(CASE WHEN k = 2 THEN"
                " (CAST(bits_set * 1000000 div m AS DECIMAL(38,0))"
                "  * (bits_set * 1000000 div m)) div 1000000"
                " ELSE"
                " (CAST(bits_set * 1000000 div m AS DECIMAL(38,0))"
                "  * (bits_set * 1000000 div m)"
                "  * (bits_set * 1000000 div m)"
                "  * (bits_set * 1000000 div m))"
                " div 1000000000000000000 END AS BIGINT)"
            ).alias("predicted_fpr_ppm"),
        )
        .orderBy("m_bits", "k")
    )


ESTIMATOR_QUERIES["q363_bloom_geometry"] = q363_bloom_geometry


def _bloom_oracle() -> str:
    grid_rows = ", ".join(f"({m}, {k})" for m, k in _BF_GRID)
    pos_member = _h32("md5('bf' || CAST(h AS VARCHAR) || ':' || fp)")
    pos_probe = _h32("md5('bf' || CAST(h AS VARCHAR) || ':' || pf)")
    return f"""
    WITH geoms(m, k) AS (VALUES {grid_rows}),
    fps AS (SELECT DISTINCT md5({_NORM}) AS fp FROM documents),
    bits AS (
      SELECT DISTINCT g.m, g.k, ({pos_member}) % g.m AS pos
      FROM fps CROSS JOIN geoms g
      CROSS JOIN (SELECT UNNEST(generate_series(1, 4)) AS h) hs
      WHERE hs.h <= g.k
    ),
    fill AS (
      SELECT m, k, CAST(COUNT(*) AS BIGINT) AS bits_set
      FROM bits GROUP BY m, k
    ),
    probes AS (
      SELECT md5('probe:' || CAST(i AS VARCHAR)) AS pf
      FROM (SELECT UNNEST(generate_series(0, {_BF_PROBES - 1})) AS i)
    ),
    ppos AS (
      SELECT g.m, g.k, p.pf, ({pos_probe}) % g.m AS pos
      FROM probes p CROSS JOIN geoms g
      CROSS JOIN (SELECT UNNEST(generate_series(1, 4)) AS h) hs
      WHERE hs.h <= g.k
    ),
    hits AS (
      SELECT pp.m, pp.k, pp.pf,
             SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      FROM ppos pp LEFT JOIN bits b
        ON b.m = pp.m AND b.k = pp.k AND b.pos = pp.pos
      GROUP BY pp.m, pp.k, pp.pf
    ),
    fpr AS (
      SELECT m, k, CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(COUNT(*) FILTER (WHERE n_hit = k) AS BIGINT)
               AS false_pos
      FROM hits GROUP BY m, k
    ),
    n_mem AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM fps)
    SELECT m AS m_bits, k, n.n_members, f.bits_set,
           CAST(f.bits_set * 1000000 // f.m AS BIGINT) AS fill_ppm,
           r.n_probes, r.false_pos,
           CAST(r.false_pos * 1000000 // r.n_probes AS BIGINT)
             AS measured_fpr_ppm,
           CAST(CASE WHEN f.k = 2 THEN
                  (CAST(f.bits_set * 1000000 // f.m AS HUGEINT)
                   * (f.bits_set * 1000000 // f.m)) // 1000000
                ELSE
                  (CAST(f.bits_set * 1000000 // f.m AS HUGEINT)
                   * (f.bits_set * 1000000 // f.m)
                   * (f.bits_set * 1000000 // f.m)
                   * (f.bits_set * 1000000 // f.m))
                  // 1000000000000000000 END AS BIGINT)
             AS predicted_fpr_ppm
    FROM fill f JOIN fpr r USING (m, k)
    CROSS JOIN n_mem n
    ORDER BY m_bits, k
    """


ESTIMATOR_ORACLES["q363_bloom_geometry"] = _bloom_oracle()


# --- q364: consistent-hash resharding churn ------------------------------------


def q364_reshard_churn(spark, sf_dir):
    """Resharding churn audit: what fraction of the corpus MOVES when
    the shard count grows 16 → 17, under (a) mod-N hashing and (b)
    rendezvous/HRW hashing (operators.skew.rendezvous_bucket). Theory
    says mod-N rewrites ~16/17 of every bucketed layout while HRW moves
    only the ~1/17 the new shard wins — this query measures both on the
    real key population, which is what you show whoever proposes
    "just re-mod the 100 TB layout" (measured vs theoretical floor,
    side by side).

    Scale shape: pure per-row projection (the HRW score spine is
    in-row, no row multiplication) feeding ONE map-side-combined
    aggregate; output is a single row.
    """
    from adhesive_spark.operators.dedup import portable_hash32
    from adhesive_spark.operators.skew import rendezvous_bucket

    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    assigned = docs.select(
        (portable_hash32(F.concat(F.lit("shard:"), key)) % 16).alias("m16"),
        (portable_hash32(F.concat(F.lit("shard:"), key)) % 17).alias("m17"),
        rendezvous_bucket(key, 16).alias("h16"),
        rendezvous_bucket(key, 17).alias("h17"),
    )
    return assigned.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(F.col("m16") != F.col("m17")).cast("long").alias(
            "mod_moved"
        ),
        F.expr(
            "CAST(count_if(m16 != m17) * 1000000 div count(*) AS BIGINT)"
        ).alias("mod_churn_ppm"),
        F.count_if(F.col("h16") != F.col("h17")).cast("long").alias(
            "hrw_moved"
        ),
        F.expr(
            "CAST(count_if(h16 != h17) * 1000000 div count(*) AS BIGINT)"
        ).alias("hrw_churn_ppm"),
        F.lit(1000000 // 17).cast("long").alias("theory_min_ppm"),
    )


ESTIMATOR_QUERIES["q364_reshard_churn"] = q364_reshard_churn


def _churn_oracle() -> str:
    key = "CAST(doc_id AS VARCHAR)"
    mod = _h32(f"md5('shard:' || {key})")
    hrw = (
        "list_max(list_transform(range(0, {n}), b -> "
        + _h32(f"md5('hrw:' || CAST(b AS VARCHAR) || ':' || {key})")
        + " * 64 + b)) % 64"
    )
    return f"""
    WITH assigned AS (
      SELECT ({mod}) % 16 AS m16,
             ({mod}) % 17 AS m17,
             {hrw.format(n=16)} AS h16,
             {hrw.format(n=17)} AS h17
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE m16 != m17) AS BIGINT) AS mod_moved,
           CAST(COUNT(*) FILTER (WHERE m16 != m17) * 1000000 // COUNT(*)
                AS BIGINT) AS mod_churn_ppm,
           CAST(COUNT(*) FILTER (WHERE h16 != h17) AS BIGINT) AS hrw_moved,
           CAST(COUNT(*) FILTER (WHERE h16 != h17) * 1000000 // COUNT(*)
                AS BIGINT) AS hrw_churn_ppm,
           CAST({1000000 // 17} AS BIGINT) AS theory_min_ppm
    FROM assigned
    """


ESTIMATOR_ORACLES["q364_reshard_churn"] = _churn_oracle()


# --- q365: Wald–Wolfowitz runs test on ingest order -----------------------------


def q365_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test of ingest-order randomness, per source:
    is document LENGTH serially correlated along doc_id order (batched
    crawls, sorted dumps), or does it arrive i.i.d.? Sequences of
    above/below-median lengths are reduced to the run count R; under
    randomness E[R] = 1 + 2n₁n₂/n and z² = (R−E)²/Var has the
    closed-form integer rational z² = (Rn − n − 2n₁n₂)²(n−1) /
    (2n₁n₂(2n₁n₂−n)) — shipped ×1000, division last, no square roots.
    A large z² says "this source's shards are length-sorted": exactly
    what silently breaks length-bucketed batch sampling (q136) and any
    'first N docs' eyeball audit at 100 TB. Values equal to the median
    are excluded (the standard treatment).

    Scale shape: the per-source median comes off the collapsed
    (source, n_chars) distinct-value table; the lag scan is
    partition-parallel across sources (the within-source order IS the
    statistic); one aggregate ends it. z² denominators are
    greatest(…,1)-guarded (degenerate all-one-side sources).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    cnts = docs.groupBy("source", "n_chars").agg(
        F.count("*").cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnts.select(
        "source", "n_chars", F.sum("c").over(wcum).alias("cum")
    )
    n_per = cnts.groupBy("source").agg(F.sum("c").cast("long").alias("n_all"))
    med = (
        cum.join(n_per, "source")
        .where(F.col("cum") * 2 >= F.col("n_all"))
        .groupBy("source")
        .agg(F.min("n_chars").alias("med"))
    )
    signed = (
        docs.join(F.broadcast(med), "source")
        .where(F.col("n_chars") != F.col("med"))
        .select(
            "source",
            "doc_id",
            (F.col("n_chars") > F.col("med")).cast("long").alias("s"),
        )
    )
    wlag = Window.partitionBy("source").orderBy("doc_id")
    runs = (
        signed.select(
            "source", "s", F.lag("s").over(wlag).alias("prev")
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("s").cast("long").alias("n1"),
            (F.count("*") - F.sum("s")).cast("long").alias("n2"),
            F.count_if(
                F.col("prev").isNull() | (F.col("s") != F.col("prev"))
            )
            .cast("long")
            .alias("runs"),
        )
    )
    return runs.select(
        "source",
        "n",
        "n1",
        "n2",
        "runs",
        F.expr(
            "CAST((n + 2 * CAST(n1 AS DECIMAL(38,0)) * n2) * 1000"
            " div n AS BIGINT)"
        ).alias("exp_runs_milli"),
        F.expr(
            "CAST((CAST(runs AS DECIMAL(38,0)) * n - n"
            "      - 2 * CAST(n1 AS DECIMAL(38,0)) * n2)"
            "     * (CAST(runs AS DECIMAL(38,0)) * n - n"
            "        - 2 * CAST(n1 AS DECIMAL(38,0)) * n2)"
            "     * (n - 1) * 1000"
            " div greatest(2 * CAST(n1 AS DECIMAL(38,0)) * n2"
            "              * (2 * CAST(n1 AS DECIMAL(38,0)) * n2 - n), 1)"
            " AS BIGINT)"
        ).alias("z2_milli"),
    ).orderBy("source")


ESTIMATOR_QUERIES["q365_runs_test"] = q365_runs_test

ESTIMATOR_ORACLES["q365_runs_test"] = """
    WITH cnts AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ),
    cum AS (
      SELECT source, n_chars,
             SUM(c) OVER (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cnts
    ),
    n_per AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_all
      FROM cnts GROUP BY source
    ),
    med AS (
      SELECT c.source, MIN(c.n_chars) AS med
      FROM cum c JOIN n_per np ON c.source = np.source
      WHERE c.cum * 2 >= np.n_all
      GROUP BY c.source
    ),
    signed AS (
      SELECT d.source, d.doc_id,
             CAST(d.n_chars > m.med AS BIGINT) AS s
      FROM documents d JOIN med m ON d.source = m.source
      WHERE d.n_chars != m.med
    ),
    lagged AS (
      SELECT source, s,
             LAG(s) OVER (PARTITION BY source ORDER BY doc_id) AS prev
      FROM signed
    ),
    runs AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2,
             CAST(COUNT(*) FILTER (WHERE prev IS NULL OR s != prev)
                  AS BIGINT) AS runs
      FROM lagged GROUP BY source
    )
    SELECT source, n, n1, n2, runs,
           CAST((n + 2 * CAST(n1 AS HUGEINT) * n2) * 1000 // n AS BIGINT)
             AS exp_runs_milli,
           CAST((CAST(runs AS HUGEINT) * n - n
                 - 2 * CAST(n1 AS HUGEINT) * n2)
                * (CAST(runs AS HUGEINT) * n - n
                   - 2 * CAST(n1 AS HUGEINT) * n2)
                * (n - 1) * 1000
                // GREATEST(2 * CAST(n1 AS HUGEINT) * n2
                            * (2 * CAST(n1 AS HUGEINT) * n2 - n), 1)
                AS BIGINT) AS z2_milli
    FROM runs ORDER BY source
"""


# --- q366: n-gram novelty per source --------------------------------------------


def q366_ngram_novelty(spark, sf_dir):
    """Per-source 5-gram novelty: the share of a source's distinct word
    5-grams that appear in NO other source — the asymmetric complement
    of q339's pairwise containment (which finds who copies whom; this
    prices what each source UNIQUELY contributes). A low-novelty source
    is mixture weight wasted on text the corpus already has — the
    first-order ranking for "which crawl do we drop at the 100 TB
    budget line?" — while novel_grams is the marginal-content currency
    that q335's reweighting and q351's saturation curve spend.

    Scale shape: one shingling pass collapses to distinct (gram,
    source); the gram-level source count is one aggregate on that
    collapsed table; a self-join on gram brings it back — all linear in
    distinct grams, never doc × doc.
    """
    from adhesive_spark.operators.dedup import word_shingles
    from adhesive_spark.sources.registry import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = (
        docs.select(
            "source",
            F.explode(word_shingles(F.col("text"), 5)).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    per_gram = grams.groupBy("g").agg(
        F.count("*").cast("long").alias("n_src")
    )
    return (
        grams.join(per_gram, "g")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count_if(F.col("n_src") == 1).cast("long").alias(
                "novel_grams"
            ),
            F.expr(
                "CAST(count_if(n_src = 1) * 1000000"
                " div greatest(count(*), 1) AS BIGINT)"
            ).alias("novelty_ppm"),
            F.max("n_src").cast("long").alias("max_gram_spread"),
        )
        .orderBy("source")
    )


ESTIMATOR_QUERIES["q366_ngram_novelty"] = q366_ngram_novelty

_G5 = ", ".join(f"toks[i+{j}]" for j in range(5))

ESTIMATOR_ORACLES["q366_ngram_novelty"] = f"""
    WITH t AS (
      SELECT source, {_NORM} AS norm, {_TOKS} AS toks FROM documents
    ),
    g AS (
      SELECT source,
             CASE WHEN len(toks) - 4 >= 1
                  THEN list_distinct(list_transform(
                         range(1, len(toks) - 4 + 1),
                         i -> concat_ws(' ', {_G5})))
                  ELSE [norm] END AS grams
      FROM t
    ),
    grams AS (
      SELECT DISTINCT source, UNNEST(grams) AS g FROM g
    ),
    per_gram AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_src
      FROM grams GROUP BY g
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE p.n_src = 1) AS BIGINT)
             AS novel_grams,
           CAST(COUNT(*) FILTER (WHERE p.n_src = 1) * 1000000
                // GREATEST(COUNT(*), 1) AS BIGINT) AS novelty_ppm,
           CAST(MAX(p.n_src) AS BIGINT) AS max_gram_spread
    FROM grams s JOIN per_gram p ON s.g = p.g
    GROUP BY s.source ORDER BY s.source
"""
