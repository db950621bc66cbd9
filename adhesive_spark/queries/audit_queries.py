"""Corpus/label audit queries (q306+): the data-quality operations
around a training run that q280–q305 did not yet cover — pairwise
preference rating (Bradley–Terry), content-defined-chunking dedup,
readability profiling, inter-annotator reliability (Krippendorff's
alpha), autocorrelation of ingest volume, an in-engine linear quality
classifier, packing-policy efficiency ladders, and a planted-duplicate
recall audit for the dedup stack itself.

House conventions: exact integer arithmetic (ppm/milli fixed point,
division LAST, Spark ``div`` / DuckDB ``//`` — both truncate toward
zero, including on DECIMAL/HUGEINT), portable md5 hashing, scalar-only
output columns, identical column aliases in query and oracle.

Reference parity note: the reference engine (milenkovicm/adhesive,
src/fusion.rs) delegates its relational surface to DataFusion and ships
none of this; this module is SURVEY §2.3 extension surface for the
100 TB pipeline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from adhesive_spark.sources.registry import load_table

AUDIT_QUERIES: dict = {}
AUDIT_ORACLES: dict = {}

#: DuckDB twins of operators.text normalization (verbatim-identical to
#: the other query modules).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _h32(hexpr: str) -> str:
    """DuckDB twin of operators.dedup.portable_hash32 (the established
    _byte_from_hex composition)."""
    from adhesive_spark.queries.pipeline_queries import _byte_from_hex

    return (
        f"({_byte_from_hex(hexpr, 1)} * 16777216 "
        f"+ {_byte_from_hex(hexpr, 2)} * 65536 "
        f"+ {_byte_from_hex(hexpr, 3)} * 256 "
        f"+ {_byte_from_hex(hexpr, 4)})"
    )


# --- q306: Bradley–Terry preference ratings (fixed-point MM) -----------------


def q306_bradley_terry(spark, sf_dir):
    """Bradley–Terry ratings from pairwise preferences via 3
    minorization–maximization iterations (Hunter 2004, "MM algorithms
    for generalized Bradley–Terry models") — the arena-leaderboard /
    reward-model-data op: convert "A beat B" counts into strengths.

    Preferences: consecutive events of one user (ts, event_id order)
    form a comparison between their event types; the higher ``value``
    wins (ties and same-type pairs are skipped). The win matrix is
    normalized to ppm of total comparisons FIRST, so every later
    number is bounded by 1e6 regardless of corpus size — the iteration
    arithmetic never grows with the data. MM update (all integer):
    ``p'_i = W_i·1e12 div Σ_j c_ij·1e12 div (p_i+p_j)``, then ratings
    are renormalized to mean 1e6. Deterministic and engine-exact —
    which is what lets an iterative fixed-point solve be value-hashed
    across engines (the q106 integer-PageRank discipline).

    Scale shape: ONE pass over events (per-user lag window) collapses
    the corpus into a K×K win matrix (K = #event types, ≤ dozens);
    every MM iteration then runs on K² rows — broadcast joins, no
    corpus-sized shuffle after the first aggregate. At 100 TB the
    matrix is still K², so iteration cost is O(1) in corpus size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    duels = (
        ev.select(
            "event_type",
            "value",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lag("value").over(w).alias("prev_value"),
        )
        .where(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
            & (F.col("prev_value") != F.col("value"))
        )
        .select(
            F.when(F.col("value") > F.col("prev_value"), F.col("event_type"))
            .otherwise(F.col("prev_type"))
            .alias("winner"),
            F.when(F.col("value") > F.col("prev_value"), F.col("prev_type"))
            .otherwise(F.col("event_type"))
            .alias("loser"),
        )
    )
    wins = duels.groupBy("winner", "loser").agg(
        F.count("*").cast("long").alias("n")
    )
    # ppm-normalize the matrix: bounds ALL later arithmetic by 1e6
    # independent of corpus size (no overflow at any sf)
    wins_ppm = (
        wins.crossJoin(F.broadcast(wins.agg(F.sum("n").alias("t"))))
        .selectExpr("winner", "loser", "n", "n * 1000000 div t AS n_ppm")
        .localCheckpoint(eager=True)
    )
    # symmetric comparison matrix c_ij (both directions present)
    c = (
        wins_ppm.selectExpr("winner AS i", "loser AS j", "n_ppm")
        .unionByName(wins_ppm.selectExpr("loser AS i", "winner AS j", "n_ppm"))
        .groupBy("i", "j")
        .agg(F.sum("n_ppm").alias("c_ppm"))
        .localCheckpoint(eager=True)
    )
    w_i = (
        wins_ppm.groupBy(F.col("winner").alias("i"))
        .agg(F.sum("n_ppm").alias("w_ppm"))
    )
    items = c.select("i").distinct()
    k_df = F.broadcast(items.agg(F.count("*").alias("k")))
    ratings = items.select("i", F.lit(1000000).cast("long").alias("p"))
    for _ in range(3):
        terms = (
            c.join(F.broadcast(ratings.withColumnsRenamed({"i": "i2", "p": "p_i"})),
                   F.col("i") == F.col("i2"))
            .join(F.broadcast(ratings.withColumnsRenamed({"i": "j2", "p": "p_j"})),
                  F.col("j") == F.col("j2"))
            .selectExpr("i", "c_ppm * 1000000000000 div (p_i + p_j) AS term")
        )
        denom = terms.groupBy("i").agg(F.sum("term").alias("denom"))
        raw = (
            denom.join(w_i, "i", "left")
            .selectExpr(
                "i",
                "coalesce(w_ppm, 0L) * 1000000000000 div denom AS p_raw",
            )
        )
        ratings = (
            raw.crossJoin(F.broadcast(raw.agg(F.sum("p_raw").alias("s"))))
            .crossJoin(k_df)
            .selectExpr("i", "p_raw * (k * 1000000) div s AS p")
            .localCheckpoint(eager=True)
        )
    losses = wins_ppm.groupBy(F.col("loser").alias("i")).agg(
        F.sum("n").alias("losses")
    )
    out = (
        ratings.join(
            wins_ppm.groupBy(F.col("winner").alias("i")).agg(
                F.sum("n").alias("wins")
            ),
            "i",
            "left",
        )
        .join(losses, "i", "left")
        .select(
            F.col("i").alias("item"),
            F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
            F.coalesce("losses", F.lit(0)).cast("long").alias("losses"),
            F.col("p").cast("long").alias("rating_ppm"),
        )
    )
    wr = Window.orderBy(F.col("rating_ppm").desc(), F.col("item"))
    return out.select(
        F.row_number().over(wr).cast("long").alias("rank"),
        "item",
        "wins",
        "losses",
        "rating_ppm",
    )


AUDIT_QUERIES["q306_bradley_terry"] = q306_bradley_terry


def _bt_iteration_sql(prev: str, cur: str) -> str:
    """One MM iteration as CTE text: prev ratings table -> cur."""
    return f"""
    d_{cur} AS (
      SELECT c.i, SUM(c.c_ppm * 1000000000000
                      // (pi.p + pj.p)) AS denom
      FROM c JOIN {prev} pi ON c.i = pi.i JOIN {prev} pj ON c.j = pj.i
      GROUP BY c.i
    ),
    raw_{cur} AS (
      SELECT d.i,
             COALESCE(w.w_ppm, 0) * 1000000000000 // d.denom AS p_raw
      FROM d_{cur} d LEFT JOIN w_i w ON d.i = w.i
    ),
    {cur} AS (
      SELECT i, p_raw * (kk.k * 1000000)
                  // (SELECT SUM(p_raw) FROM raw_{cur}) AS p
      FROM raw_{cur}, kk
    )"""


AUDIT_ORACLES["q306_bradley_terry"] = f"""
    WITH ev AS (
      SELECT event_type, value,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev_value
      FROM events
    ),
    duels AS (
      SELECT CASE WHEN value > prev_value THEN event_type
                  ELSE prev_type END AS winner,
             CASE WHEN value > prev_value THEN prev_type
                  ELSE event_type END AS loser
      FROM ev
      WHERE prev_type IS NOT NULL
        AND prev_type <> event_type AND prev_value <> value
    ),
    wins AS (
      SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS n
      FROM duels GROUP BY winner, loser
    ),
    wins_ppm AS (
      SELECT winner, loser, n,
             n * 1000000 // (SELECT SUM(n) FROM wins) AS n_ppm
      FROM wins
    ),
    c AS (
      SELECT i, j, SUM(n_ppm) AS c_ppm FROM (
        SELECT winner AS i, loser AS j, n_ppm FROM wins_ppm
        UNION ALL
        SELECT loser AS i, winner AS j, n_ppm FROM wins_ppm
      ) GROUP BY i, j
    ),
    w_i AS (SELECT winner AS i, SUM(n_ppm) AS w_ppm
            FROM wins_ppm GROUP BY winner),
    items AS (SELECT DISTINCT i FROM c),
    kk AS (SELECT COUNT(*) AS k FROM items),
    r0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM items),
    {_bt_iteration_sql("r0", "r1")},
    {_bt_iteration_sql("r1", "r2")},
    {_bt_iteration_sql("r2", "r3")}
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r3.p DESC, r3.i)
                AS BIGINT) AS rank,
           r3.i AS item,
           CAST(COALESCE(w.tw, 0) AS BIGINT) AS wins,
           CAST(COALESCE(l.tl, 0) AS BIGINT) AS losses,
           CAST(r3.p AS BIGINT) AS rating_ppm
    FROM r3
    LEFT JOIN (SELECT winner, SUM(n) AS tw FROM wins_ppm
               GROUP BY winner) w ON r3.i = w.winner
    LEFT JOIN (SELECT loser, SUM(n) AS tl FROM wins_ppm
               GROUP BY loser) l ON r3.i = l.loser
"""


# --- q308: Flesch reading-ease profile ----------------------------------------


def q308_flesch_readability(spark, sf_dir):
    """Flesch reading-ease per source (Flesch 1948), integer-milli:
    ``206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)`` with
    the standard vowel-group syllable heuristic (runs of [aeiouy] in
    the normalized text; a space always breaks a run, so the whole-text
    count equals the per-word sum — no token explode needed). Sentences
    = terminal-punctuation count + 1. Both ratios are computed with
    truncating integer division (division LAST), so the score is
    engine-exact; per-source mean and easy/hard band rates in ppm.

    Scale shape: ENTIRELY IN-ROW per document (three regexp passes,
    zero explodes, zero Python), then one rollup shuffle on source —
    corpus-linear, the cheapest possible query shape."""
    from adhesive_spark.operators.text import normalize_text, token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        token_count(F.col("text")).cast("long").alias("w"),
        (
            F.length(F.regexp_replace(F.col("text"), r"[^.!?]", ""))
            + F.lit(1)
        )
        .cast("long")
        .alias("s"),
        F.size(
            F.regexp_extract_all(
                normalize_text(F.col("text")), F.lit("[aeiouy]+"), 0
            )
        )
        .cast("long")
        .alias("syl"),
    )
    scored = docs.selectExpr(
        "source",
        "206835 - 1015 * w div s - 84600 * syl div greatest(w, 1L)"
        " AS score_milli",
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(score_milli) div count(*)").alias("mean_score_milli"),
        F.expr(
            "sum(CASE WHEN score_milli >= 60000 THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        ).alias("easy_ppm"),
        F.expr(
            "sum(CASE WHEN score_milli < 30000 THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        ).alias("hard_ppm"),
    )


AUDIT_QUERIES["q308_flesch_readability"] = q308_flesch_readability

AUDIT_ORACLES["q308_flesch_readability"] = f"""
    WITH d AS (
      SELECT source,
             CAST(len({_TOKS}) AS BIGINT) AS w,
             CAST(length(regexp_replace(text, '[^.!?]', '', 'g')) + 1
                  AS BIGINT) AS s,
             CAST(len(regexp_extract_all({_NORM}, '[aeiouy]+'))
                  AS BIGINT) AS syl
      FROM documents
    ),
    scored AS (
      SELECT source,
             206835 - 1015 * w // s
                    - 84600 * syl // greatest(w, 1) AS score_milli
      FROM d
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_milli) // COUNT(*) AS BIGINT) AS mean_score_milli,
           CAST(SUM(CASE WHEN score_milli >= 60000 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS easy_ppm,
           CAST(SUM(CASE WHEN score_milli < 30000 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS hard_ppm
    FROM scored GROUP BY source
"""


# --- q307: content-defined-chunking dedup audit --------------------------------


def q307_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking dedup audit (the rsync/LBFS/restic
    storage trick applied to corpus text): tokens stream into chunks
    that END at any token whose portable hash ≡ 0 (mod 16) — so chunk
    boundaries are CONTENT-defined and survive insertions/deletions
    (a shifted document re-aligns at the next boundary, unlike
    fixed-width blocks). Per source: total vs distinct chunk counts and
    bytes, and the dedup savings in ppm.

    Scale shape: chunk assembly is ENTIRELY IN-ROW (one linear
    higher-order aggregate per document — no window, no shuffle), then
    one explode (≤ tokens rows) and two keyed aggregates
    ((source, chunk_hash) then source — both map-side combined).
    Corpus-linear; the chunk-hash shuffle is the dedup-store build a
    real CDC system ships."""
    from adhesive_spark.operators.dedup import portable_hash32
    from adhesive_spark.operators.text import tokens
    from adhesive_spark.sources.registry import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    )

    init = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.lit("").alias("cur"),
    )

    def step(acc, tok):
        cur2 = F.when(acc["cur"] == "", tok).otherwise(
            F.concat_ws(" ", acc["cur"], tok)
        )
        is_boundary = portable_hash32(tok) % 16 == F.lit(0)
        return F.when(
            is_boundary,
            F.struct(
                F.array_append(acc["chunks"], cur2).alias("chunks"),
                F.lit("").alias("cur"),
            ),
        ).otherwise(
            F.struct(acc["chunks"].alias("chunks"), cur2.alias("cur"))
        )

    def finish(acc):
        return F.when(
            acc["cur"] == "", acc["chunks"]
        ).otherwise(F.array_append(acc["chunks"], acc["cur"]))

    chunks = docs.select(
        "source",
        F.explode(F.aggregate(F.col("toks"), init, step, finish)).alias(
            "chunk"
        ),
    ).select(
        "source",
        F.md5(F.col("chunk")).alias("h"),
        F.length("chunk").cast("long").alias("n_bytes"),
    )
    per_hash = chunks.groupBy("source", "h").agg(
        F.count("*").cast("long").alias("cnt"),
        F.first("n_bytes").alias("blen"),
    )
    return per_hash.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count("*").cast("long").alias("n_unique"),
        F.sum(F.col("cnt") * F.col("blen")).cast("long").alias("total_bytes"),
        F.sum("blen").cast("long").alias("unique_bytes"),
        F.expr(
            "(sum(cnt * blen) - sum(blen)) * 1000000"
            " div greatest(sum(cnt * blen), 1L)"
        ).alias("saved_ppm"),
    )


AUDIT_QUERIES["q307_cdc_chunk_dedup"] = q307_cdc_chunk_dedup

AUDIT_ORACLES["q307_cdc_chunk_dedup"] = f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    tok AS (
      SELECT doc_id, source, i, toks[i] AS tok,
             CASE WHEN CAST({_h32("md5(toks[i])")} AS BIGINT) % 16 = 0
                  THEN 1 ELSE 0 END AS b
      FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    cidx AS (
      SELECT doc_id, source, i, tok,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cid
      FROM tok
    ),
    chunks AS (
      SELECT source, md5(string_agg(tok, ' ' ORDER BY i)) AS h,
             CAST(length(string_agg(tok, ' ' ORDER BY i)) AS BIGINT)
               AS blen
      FROM cidx GROUP BY doc_id, source, cid
    ),
    per_hash AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(blen) AS blen
      FROM chunks GROUP BY source, h
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(cnt * blen) AS BIGINT) AS total_bytes,
           CAST(SUM(blen) AS BIGINT) AS unique_bytes,
           CAST((SUM(cnt * blen) - SUM(blen)) * 1000000
                // greatest(SUM(cnt * blen), 1) AS BIGINT) AS saved_ppm
    FROM per_hash GROUP BY source
"""


# --- q309: Krippendorff's alpha (nominal) ---------------------------------------


def q309_krippendorff_alpha(spark, sf_dir):
    """Krippendorff's alpha (nominal data, 3 raters per unit) over a
    deterministic synthetic annotation panel — the inter-annotator
    reliability gate an RLHF labeling pipeline ships before trusting a
    batch of labels. Raters: annotator A reports the base label (md5
    lane of doc_id, 4 classes); B flips to a different class on a 10%
    hash lane, C on a 20% lane — so the panel has known, non-trivial
    disagreement. Exact integer form: with m=3 raters per unit,
    per-unit disagreement is 6−2e (e = matching rater pairs), so
    ``alpha = 1 − dis·(n−1) / (2·Σ_c n_c(n−n_c))`` with n = 3·units —
    division LAST in DECIMAL(38,0)/HUGEINT (the q252/q271 headroom
    policy), reported in ppm.

    Scale shape: labels and the per-unit pair count are IN-ROW (zero
    explode — category marginals are 4 conditional sums over the 3
    label columns); the whole query is ONE global aggregate. At 100 TB
    it is a single map-side-combined pass."""
    from adhesive_spark.operators.dedup import portable_hash32

    def lane(prefix):
        return portable_hash32(
            F.concat(F.lit(prefix), F.col("doc_id").cast("string"))
        )

    base = lane("lbl:") % 4
    hb, hc = lane("nb:"), lane("nc:")
    ann_a = base
    ann_b = F.when(hb % 10 == 0, (base + 1 + hb % 3) % 4).otherwise(base)
    ann_c = F.when(hc % 5 == 0, (base + 1 + hc % 3) % 4).otherwise(base)

    docs = load_table(spark, sf_dir, "documents").select(
        ann_a.alias("a"), ann_b.alias("b"), ann_c.alias("c")
    )
    per_unit = docs.select(
        (
            (F.col("a") == F.col("b")).cast("long")
            + (F.col("a") == F.col("c")).cast("long")
            + (F.col("b") == F.col("c")).cast("long")
        ).alias("e"),
        *[
            (
                (F.col("a") == v).cast("long")
                + (F.col("b") == v).cast("long")
                + (F.col("c") == v).cast("long")
            ).alias(f"m{v}")
            for v in range(4)
        ],
    )
    agg = per_unit.agg(
        F.count("*").cast("long").alias("n_units"),
        F.sum(F.lit(6) - F.lit(2) * F.col("e")).cast("long").alias("dis"),
        F.sum("e").cast("long").alias("agree_pairs"),
        *[F.sum(f"m{v}").cast("long").alias(f"n{v}") for v in range(4)],
    )
    return agg.selectExpr(
        "n_units",
        "n_units * 3 AS n_values",
        "dis",
        "n0 * (n_units * 3 - n0) + n1 * (n_units * 3 - n1)"
        " + n2 * (n_units * 3 - n2) + n3 * (n_units * 3 - n3) AS de2",
        # division LAST with DECIMAL(38,0) headroom: dis·(n−1)·1e6
        # overflows BIGINT past ~7e5 units
        "CAST(1000000 - CAST(dis AS DECIMAL(38,0)) * (n_units * 3 - 1)"
        " * 1000000 div (2 * CAST("
        "n0 * (n_units * 3 - n0) + n1 * (n_units * 3 - n1)"
        " + n2 * (n_units * 3 - n2) + n3 * (n_units * 3 - n3)"
        " AS DECIMAL(38,0))) AS BIGINT) AS alpha_ppm",
        "agree_pairs * 1000000 div (n_units * 3) AS agree_ppm",
    )


AUDIT_QUERIES["q309_krippendorff_alpha"] = q309_krippendorff_alpha

_KRIPP_LANES = f"""
      SELECT CAST({_h32("md5('lbl:' || CAST(doc_id AS VARCHAR))")}
                  AS BIGINT) % 4 AS base,
             CAST({_h32("md5('nb:' || CAST(doc_id AS VARCHAR))")}
                  AS BIGINT) AS hb,
             CAST({_h32("md5('nc:' || CAST(doc_id AS VARCHAR))")}
                  AS BIGINT) AS hc
      FROM documents
"""

AUDIT_ORACLES["q309_krippendorff_alpha"] = f"""
    WITH lanes AS ({_KRIPP_LANES}),
    labels AS (
      SELECT base AS a,
             CASE WHEN hb % 10 = 0 THEN (base + 1 + hb % 3) % 4
                  ELSE base END AS b,
             CASE WHEN hc % 5 = 0 THEN (base + 1 + hc % 3) % 4
                  ELSE base END AS c
      FROM lanes
    ),
    per_unit AS (
      SELECT CAST(a = b AS BIGINT) + CAST(a = c AS BIGINT)
               + CAST(b = c AS BIGINT) AS e,
             {", ".join(
                 f"CAST(a = {v} AS BIGINT) + CAST(b = {v} AS BIGINT)"
                 f" + CAST(c = {v} AS BIGINT) AS m{v}"
                 for v in range(4)
             )}
      FROM labels
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(6 - 2 * e) AS BIGINT) AS dis,
             CAST(SUM(e) AS BIGINT) AS agree_pairs,
             {", ".join(
                 f"CAST(SUM(m{v}) AS BIGINT) AS n{v}" for v in range(4)
             )}
      FROM per_unit
    )
    SELECT n_units, n_units * 3 AS n_values, dis,
           n0 * (n_units * 3 - n0) + n1 * (n_units * 3 - n1)
             + n2 * (n_units * 3 - n2) + n3 * (n_units * 3 - n3) AS de2,
           CAST(1000000 - CAST(dis AS HUGEINT) * (n_units * 3 - 1)
                * 1000000 // (2 * CAST(
                  n0 * (n_units * 3 - n0) + n1 * (n_units * 3 - n1)
                  + n2 * (n_units * 3 - n2) + n3 * (n_units * 3 - n3)
                  AS HUGEINT)) AS BIGINT) AS alpha_ppm,
           agree_pairs * 1000000 // (n_units * 3) AS agree_ppm
    FROM agg
"""
