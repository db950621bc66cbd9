"""Materialize a scaled-up bench fixture from an existing testdata dir.

Round-13 measurement-capability tool (VERDICT r12 item 2): at sf0.1 on
local[32] every headline query is fixed-overhead-bound (the 8-core
control run BEAT the 32-core run, BENCH_r12_c8), so the bench can no
longer resolve parallelism or most real plan changes.  This tool writes
an sf1-equivalent directory by replicating the sf0.1 tables N× with
deterministic key remapping, so the SAME bench.py contract
(`SPARK_GRAFT_SF_DIR=<out> python bench.py`) can be pointed at a rung
where scan/shuffle work dominates fixed job cost.

Replication semantics (mirrors tools/stress.py's in-cluster replicate):

- region / nation stay fixed (TPC-H-style dimension tables).
- Every fact/entity key k becomes ``k + copy * (max_k + 1)`` for copy in
  [0, reps); foreign keys are shifted by the SAME per-copy offset so
  referential integrity is preserved within each copy.  Copy 0 keeps the
  original ids, so literal probe/query-set filters (vec_id < 10,
  doc_id < 300 ...) keep selecting the ORIGINAL small side while the
  corpus side grows N× — the realistic fixed-queries/growing-corpus
  scaling.
- Non-key payload columns are copied verbatim: every document/vector
  gains N-1 exact duplicates, the same hazard model STRESS.md ladders
  (dedup must absorb N-copy clusters, ANN must absorb N-copy density).

No Spark needed: plain pyarrow, deterministic output (row order is
copy-major then source order), ~10 s for reps=10 over sf0.1.

Usage: python tools/make_scaled_fixture.py <src_sf_dir> <out_dir> [reps]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: table -> columns to shift by copy * (max(col) + 1).  The offset base
#: is the table that OWNS the key (so orders.o_custkey shifts by
#: customer's base, etc.).
KEYED = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
FIXED = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/fixtures/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    tables: dict[str, pa.Table] = {}
    for name in FIXED + sorted(KEYED):
        tables[name] = pq.read_table(os.path.join(src, f"{name}.parquet"))

    # key bases: max(owning column) + 1
    bases: dict[str, int] = {}
    for name, cols in KEYED.items():
        for col, owner in cols.items():
            oname, ocol = owner.split(".")
            if owner not in bases:
                bases[owner] = (
                    pc.max(tables[oname][ocol]).as_py() + 1
                )

    for name in FIXED:
        pq.write_table(tables[name], os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied fixed ({tables[name].num_rows} rows)")

    for name in sorted(KEYED):
        t = tables[name]
        # one FILE per copy inside a directory: a real N×-sized input
        # arrives as many files, and a single ~100 MB file under the
        # default 128 MB maxPartitionBytes scans as ONE task — the
        # serialized-scan pitfall the r12 stress-fixture widening fixed
        # (STRESS.md "Fixture protocol").  Spark and DuckDB both read
        # the directory transparently.
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        total = 0
        for copy in range(reps):
            if copy == 0:
                part = t
            else:
                cols = []
                for field in t.schema:
                    col = t[field.name]
                    owner = KEYED[name].get(field.name)
                    if owner is not None:
                        off = pa.scalar(
                            copy * bases[owner], type=field.type
                        )
                        col = pc.add_checked(col, off)
                    cols.append(col)
                part = pa.table(cols, schema=t.schema)
            pq.write_table(
                part,
                os.path.join(d, f"copy-{copy:03d}.parquet"),
                row_group_size=max(4096, part.num_rows // 4),
            )
            total += part.num_rows
        print(f"{name}: {t.num_rows} -> {total} rows ({reps} files)")


if __name__ == "__main__":
    main()
