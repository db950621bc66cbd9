"""Fast oracle-validity guard: every oracle_sql() string must PARSE and
BIND in DuckDB against the real table schemas (EXPLAIN — no execution).
The full checker (tools/check_correctness.py) proves values; this test
catches an oracle syntax/column regression in seconds instead, so it
can run on every edit."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_every_oracle_parses_and_binds(con):
    oracles = entry_mod.oracle_sql()
    assert oracles, "no oracles registered"
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as ex:  # noqa: BLE001 — report all failures at once
            bad[name] = str(ex).splitlines()[0]
    assert not bad, f"oracles failed to bind: {bad}"


def test_every_oracle_output_is_scalar_typed(con):
    """Driver-protocol guard on output DTYPES, caught at BIND time (no
    execution): the driver's hash canonicalizer crashes on list-typed
    cells (pandas ``unhashable type: 'list'`` — the r6 q141/q149 ERR
    class), so no registered query may emit array/struct/map/blob
    columns.  DESCRIBE gives the oracle's bound output schema in
    milliseconds; since the driver also requires spark/oracle dtype
    agreement, a scalar-only oracle schema pins the contract from both
    sides (the Spark side is asserted per-query in
    tests/test_plans.py::test_plans_md_shuffle_ratchet)."""
    oracles = entry_mod.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        try:
            cols = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as ex:  # noqa: BLE001
            bad[name] = str(ex).splitlines()[0]
            continue
        complex_cols = [
            (c[0], c[1])
            for c in cols
            if "[]" in c[1] or any(
                k in c[1].upper() for k in ("STRUCT", "MAP(", "BLOB", "LIST")
            )
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        f"complex-typed oracle output (driver canon crashes on these): "
        f"{bad} — flatten to strings (array_to_string)"
    )


def test_q403_oracle_span_bound_is_per_row():
    """r9 ADVICE: the q403 oracle once capped spans at a fixed
    range(0, 50) while the Spark side generates size(toks) div 20
    spans unbounded — a >1000-token document silently diverged.  The
    oracle must derive its span count per-row from len(toks) // 20."""
    sql = entry_mod.oracle_sql()["q403_keep_policy_divergence"]
    assert "range(0, 50)" not in sql
    assert "len(toks) // 20" in sql


def test_q363_oracle_hash_spine_tracks_grid():
    """r9 ADVICE: the q363 oracle once hard-coded generate_series(1, 4)
    for the per-geometry hash spine; a k>4 geometry added to _BF_GRID
    would silently truncate the oracle's hash functions.  The bound
    must be derived from max(k) of the grid."""
    from adhesive_spark.queries.estimator_queries import _BF_GRID

    sql = entry_mod.oracle_sql()["q363_bloom_geometry"]
    k_max = max(k for _, k in _BF_GRID)
    assert f"generate_series(1, {k_max})" in sql
    # spine bound appears for both the member and probe positions
    assert sql.count(f"generate_series(1, {k_max})) AS h") == 2
