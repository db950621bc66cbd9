"""Walkthrough of the estimation & infrastructure-calibration family
(queries/estimator_queries.py): the closed-form estimators a pipeline
runs to price its own machinery before committing a 100 TB job —
richness extrapolation, drift distances, sketch-geometry ladders,
resharding churn, sampling economics, and the token-cost ledger.

Run: ``python examples/estimator_demo.py [sf_dir]``
(defaults to /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adhesive_spark.session import build_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_spark(app_name="estimator-demo", shuffle_partitions=8)

    from adhesive_spark.queries import estimator_queries as E

    print("\n== Chao1: how much vocabulary has each source NOT shown us?")
    E.q359_chao1_richness(spark, sf_dir).show(5, truncate=False)

    print("== TV distance: which two sources are really the same crawl?")
    E.q361_tv_distance(spark, sf_dir).show(5, truncate=False)

    print("== Bloom geometry: measured FPR vs fill^k per (m, k) cell")
    E.q363_bloom_geometry(spark, sf_dir).show(truncate=False)

    print("== Resharding: HRW vs mod-N churn at 16 -> 17 shards")
    E.q364_reshard_churn(spark, sf_dir).show(truncate=False)

    print("== Ratio estimator: pricing a tokenizer pass from a 10% sample")
    E.q381_ratio_estimator(spark, sf_dir).show(truncate=False)

    print("== Partition planner: will shuffle.partitions=P straggle?")
    E.q393_partition_size_planner(spark, sf_dir).show(truncate=False)

    print("== Watermark planner: the measured p99 out-of-orderness")
    E.q394_watermark_planner(spark, sf_dir).show(truncate=False)

    print("== Token economics: what a million raw tokens actually buy")
    E.q400_token_economics(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
