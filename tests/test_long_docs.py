"""Long-document divergence guard for q403 (r9 ADVICE, medium).

The advice: q403's oracle once capped spans at a fixed ``range(0, 50)``
while the Spark side generated spans for ALL ``i < size(toks) div 20``
— so any document longer than 1000 tokens made query and oracle
silently diverge, and the shipped corpora (≤ ~100 tokens/doc) could
never catch it.  The static guard in test_oracle_sql_binds pins the
SQL text; THIS test proves the behavior: it builds a corpus whose
documents reach 1500 tokens (75 spans — 25 past the old cap) and runs
the real queries() entry against the real oracle_sql() on it, through
the same order-insensitive comparison the driver uses.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import compare


def _long_corpus() -> pd.DataFrame:
    rows = []
    for doc_id in range(30):
        if doc_id < 10:
            # 1500 tokens = 75 spans/doc.  The first 1000 tokens (spans
            # 0-49, everything the OLD capped oracle could see) are
            # doc-UNIQUE — zero clusters there; the last 500 tokens
            # (spans 50-74) are IDENTICAL across the ten docs — every
            # cluster q403 finds lives past the old cap, so the capped
            # oracle reports n_clusters = 0 and the fixed one does not
            # (divergence machine-verified in the sibling test below)
            toks = [f"u{doc_id}_{i}" for i in range(1000)] + [
                f"shared_{i}" for i in range(500)
            ]
        else:
            toks = [f"v{doc_id}_{i}" for i in range(120)]
        text = " ".join(toks)
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": "en",
                "source": f"s{doc_id % 4}",
                "n_chars": len(text),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def long_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("long_docs_sf")
    _long_corpus().to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_q403_matches_oracle_on_1500_token_docs(spark, long_sf_dir):
    sdf = entry_mod.queries()["q403_keep_policy_divergence"](
        spark, long_sf_dir
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{long_sf_dir}/documents.parquet'"
    )
    odf = con.execute(
        entry_mod.oracle_sql()["q403_keep_policy_divergence"]
    ).fetchdf()
    problems = compare("q403_long_docs", sdf, odf)
    assert not problems, problems
    # the corpus is built so span clusters exist — an accidentally-empty
    # join would vacuously "match"
    assert int(sdf.iloc[0]["n_clusters"]) > 0


def test_long_corpus_exposes_the_old_cap(long_sf_dir):
    """Anti-degeneration guard for the corpus itself: re-introduce the
    pre-fix fixed ``range(0, 50)`` into the oracle and prove it gives a
    DIFFERENT answer on this corpus (the first corpus draft used
    periodic vocab, whose tail spans collapsed into already-seen
    fingerprints and could not discriminate)."""
    sql = entry_mod.oracle_sql()["q403_keep_policy_divergence"]
    capped = sql.replace(
        "LATERAL (SELECT UNNEST(range(0, len(toks) // 20)) AS i) g",
        "(SELECT UNNEST(range(0, 50)) AS i) g"
        " WHERE len(toks) >= (i + 1) * 20",
    )
    assert capped != sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{long_sf_dir}/documents.parquet'"
    )
    new = con.execute(sql).fetchdf()
    old = con.execute(capped).fetchdf()
    assert int(new.iloc[0]["n_clusters"]) > 0
    assert not new.equals(old)
