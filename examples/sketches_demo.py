"""Sketches & retrieval walkthrough: the constant-state profiling and
compressed-ANN layer (operators/sketches.py, queries/sketch_queries.py)
driven end-to-end on the sf0.001 testdata — every number shown here is
bit-exact against the DuckDB oracle the driver grades with.

The through-line is MERGEABILITY: HLL registers max-merge (executor
partials, per-group rollups, streaming micro-batches — all the same 64
rows), CMS counters add, PQ codes make the corpus 4 bytes/vector with
all distance work against broadcast lookup tables.

Run: ``python examples/sketches_demo.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adhesive_spark.session import build_spark  # noqa: E402


def main() -> None:
    from adhesive_spark.queries.sketch_queries import (
        q241_hll_cardinality,
        q242_cms_heavyhitters,
        q243_bm25_retrieval,
        q245_kcore_peel,
        q246_pq_ann,
        q248_ivfpq_ann,
        q249_hll_per_group,
        q252_chisq_independence,
    )

    spark = build_spark(app_name="sketches-demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    print("\n-- HLL cardinality: 64 registers vs the exact distinct, self-audited")
    q241_hll_cardinality(spark, sf).show()

    print("-- per-supplier HLL rollup (first 5): registers keyed (group, bucket)")
    q249_hll_per_group(spark, sf).show(5)

    print("-- Count-Min heavy hitters: collisions quantified, never undercounts")
    q242_cms_heavyhitters(spark, sf).show(5)

    print("-- BM25 top docs for {hash, join, vector}, fixed-point, one corpus shuffle")
    q243_bm25_retrieval(spark, sf).show(5)

    print("-- bounded k-core peel: per-round shrink curve")
    q245_kcore_peel(spark, sf).show()

    print("-- PQ-ANN: 4-byte codes + broadcast ADC lookup, exact integer distances")
    q246_pq_ann(spark, sf).show(5)

    print("-- IVF-PQ: coarse probe-2 pruning composed with the same codes")
    q248_ivfpq_ann(spark, sf).show(5)

    print("-- chi-square independence (event_type x weekend), exact milli")
    q252_chisq_independence(spark, sf).show()

    spark.stop()


if __name__ == "__main__":
    main()
