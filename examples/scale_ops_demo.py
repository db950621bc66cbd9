"""Scale-operations walkthrough: the data-layout / maintenance /
loader-planning layer a 100 TB pipeline runs around its analytics —
the round-6 extension family (queries/scale_queries.py), driven
end-to-end on the sf0.001 testdata.

Run: ``python examples/scale_ops_demo.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adhesive_spark.session import build_spark  # noqa: E402


def main() -> None:
    from adhesive_spark.queries.scale_queries import (
        q217_zorder_layout,
        q218_compaction_plan,
        q220_epoch_shuffle,
        q224_tokenizer_apply,
        q231_exact_quantile_ladder,
        q233_token_budget_fill,
    )

    spark = build_spark(app_name="scale-ops-demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    print("\n-- Z-order vs natural layout: blocks a 2-D predicate scans")
    q217_zorder_layout(spark, sf).show()

    print("-- compaction plan (first 5 partitions)")
    q218_compaction_plan(spark, sf).orderBy("source", "lang").show(5)

    print("-- deterministic epoch shuffle (proof each epoch permutes)")
    q220_epoch_shuffle(spark, sf).orderBy("epoch").show()

    print("-- tokenizer fertility per language (pure Catalyst fold)")
    q224_tokenizer_apply(spark, sf).orderBy("lang").show()

    print("-- exact p50/p90/p99 event-value ladder (no global sort)")
    q231_exact_quantile_ladder(spark, sf).orderBy(
        "event_type", "quantile"
    ).show()

    print("-- quality-greedy token budget fill (40% of corpus tokens)")
    q233_token_budget_fill(spark, sf).orderBy(
        "cum_before"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
