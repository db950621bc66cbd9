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
