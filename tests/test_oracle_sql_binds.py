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
