"""Evaluation & measurement walkthrough: the metrics layer a pipeline
publishes about its own classifiers, filters and drift
(queries/eval_queries.py) driven end-to-end on the sf0.001 testdata —
every number shown here is bit-exact against the DuckDB oracle the
driver grades with (integer ppm, no floats in any output column).

The through-line is EXACTNESS AT SCALE: each metric collapses the
corpus in its first aggregate (per-distinct-score counts, grid cells,
per-day sums, 1024 bloom words) and does all ordering/window work on
that bounded table — so the same query is cheap at 4 k rows and at
4 B rows.

Run: ``python examples/eval_demo.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adhesive_spark.session import build_spark  # noqa: E402


def main() -> None:
    from adhesive_spark.queries.eval_queries import (
        q256_roc_auc,
        q257_calibration_bins,
        q258_bloom_join_prefilter,
        q259_cusum_changepoint,
        q260_grid_density_clusters,
        q261_stump_split_gain,
        q262_l_diversity,
        q263_link_prediction,
        q265_benford_audit,
        q266_abtest_srm,
        q267_negative_sampling,
        q269_vocab_coverage,
    )

    spark = build_spark(app_name="eval-demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    print("\n-- exact ROC-AUC (rank-sum with tie rule): one per-score aggregate")
    q256_roc_auc(spark, sf).show()

    print("-- calibration bins: predicted vs observed positive rate per decile")
    q257_calibration_bins(spark, sf).show()

    print("-- bloom join-prefilter: realized FP rate + no-false-negative bit")
    q258_bloom_join_prefilter(spark, sf).show()

    print("-- CUSUM change-point: top-5 |cusum| days of daily revenue")
    q259_cusum_changepoint(spark, sf).show()

    print("-- grid-density clusters: DBSCAN shape, no pair term")
    q260_grid_density_clusters(spark, sf).show()

    print("-- decision-stump Gini gain at each score decile")
    q261_stump_split_gain(spark, sf).show()

    print("-- l-diversity histogram: homogeneity-attack screen")
    q262_l_diversity(spark, sf).show()

    print("-- link prediction: common-neighbor / Jaccard / Adamic-Adar")
    q263_link_prediction(spark, sf).show(5)

    print("-- Benford first-digit audit (synthetic prices are NOT Benford)")
    q265_benford_audit(spark, sf).show()

    print("-- A/B readout with sample-ratio-mismatch guard")
    q266_abtest_srm(spark, sf).show()

    print("-- deterministic negative-sampling plan (first rows)")
    q267_negative_sampling(spark, sf).show(6)

    print("-- vocabulary coverage curve (tokenizer sizing)")
    q269_vocab_coverage(spark, sf).show()

    from adhesive_spark.queries.eval_queries import (
        q270_feature_matrix,
        q271_cuped_audit,
    )

    print("-- point-in-time feature matrix (first rows, leakage-free)")
    q270_feature_matrix(spark, sf).show(5)

    print("-- CUPED audit: covariate power measured, sign-safe")
    q271_cuped_audit(spark, sf).show()

    from adhesive_spark.queries.eval_queries import (
        q272_quantile_treatment_effect,
        q274_grid_clusters_star,
        q275_theil_sen_trend,
        q276_bfs_frontier,
    )

    print("-- quantile treatment effect: exact per-arm p50/p90 deltas")
    q272_quantile_treatment_effect(spark, sf).show()

    print("-- grid clusters via large-star/small-star (same answer, log rounds)")
    q274_grid_clusters_star(spark, sf).show(5)

    print("-- Theil-Sen robust trend vs outlier days")
    q275_theil_sen_trend(spark, sf).show()

    print("-- bounded-hop BFS frontier over the co-affiliation graph")
    q276_bfs_frontier(spark, sf).show()


if __name__ == "__main__":
    main()
