"""Training-run assembly walkthrough: the operations between a curated
corpus and a training job (queries/training_queries.py), driven
end-to-end on the sf0.001 testdata — every number shown is bit-exact
against the DuckDB oracle the driver grades with (integer ppm fixed
point, portable md5 hashing, division last).

The through-line is PLAN BEFORE MATERIALIZE: importance weights from an
8192-row broadcast table, shard cuts and sequence windows computed as
closed-form metadata, rebalance and resample ratios priced before a
single row moves — the queries a 100 TB training-data pipeline runs to
DECIDE what the expensive jobs will do.

Run: ``python examples/training_demo.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adhesive_spark.session import build_spark  # noqa: E402


def main() -> None:
    from adhesive_spark.queries.training_queries import (
        q280_dsir_importance,
        q281_gopher_repetition,
        q282_shard_manifest,
        q283_ivf_occupancy,
        q284_pass_at_k,
        q285_dedup_policy_delta,
        q286_epoch_shuffle_audit,
        q287_tokenizer_fertility,
        q288_hrw_rebalance,
        q289_sequence_windows,
        q290_disorder_audit,
        q291_class_rebalance,
        q292_preference_pairs,
        q293_context_overflow,
        q294_mixture_waterfill,
        q295_epoch_budget,
        q296_chisq_independence,
        q297_rank_agreement,
        q298_dispersion_index,
        q299_lsh_label_purity,
        q300_training_funnel,
        q302_harmonic_closeness,
        q303_token_gini,
    )

    spark = build_spark(app_name="training-demo")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    print("\n-- DSIR importance: top target-like documents (integer log2 ratio)")
    q280_dsir_importance(spark, sf).show(5)

    print("-- Gopher repetition rules: per-source fail counts")
    q281_gopher_repetition(spark, sf).show(5)

    print("-- shard manifest: per-bucket shard counts and fill balance")
    q282_shard_manifest(spark, sf).orderBy("bucket").show(5)

    print("-- IVF occupancy: the nprobe coverage curve")
    q283_ivf_occupancy(spark, sf).orderBy("rank").show(16)

    print("-- exact pass@k over the simulated attempt log")
    q284_pass_at_k(spark, sf).orderBy("k").show()

    print("-- dedup ladder: what bag-of-words canonicalization adds")
    q285_dedup_policy_delta(spark, sf).orderBy("source").show(5)

    print("-- epoch shuffle audit: pairwise sample overlap vs independence")
    q286_epoch_shuffle_audit(spark, sf).show()

    print("-- tokenizer fertility per language")
    q287_tokenizer_fertility(spark, sf).orderBy("lang").show()

    print("-- rendezvous rebalance: mod vs HRW migration cost, 16 -> 20")
    q288_hrw_rebalance(spark, sf).show()

    print("-- sequence windows: drop-remainder cost per (max_len, stride)")
    q289_sequence_windows(spark, sf).orderBy("max_len", "stride").show()

    print("-- event-time disorder: the watermark-sizing measurement")
    q290_disorder_audit(spark, sf).orderBy("event_type").show()

    print("-- class rebalance: exact keep ratios to the minority count")
    q291_class_rebalance(spark, sf).orderBy("label").show()

    print("-- preference pairs: margin-band rollup of best/worst responses")
    q292_preference_pairs(spark, sf).orderBy("margin_band").show()

    print("-- context overflow: truncation loss per candidate window")
    q293_context_overflow(spark, sf).orderBy("source").show(5)

    print("-- mixture water-fill: bottleneck-scaled recipe allocation")
    q294_mixture_waterfill(spark, sf).orderBy("source").show()

    print("-- epoch budget: sources a 5B-token run would over-repeat")
    q295_epoch_budget(spark, sf).orderBy("source").show()

    print("-- chi-square: is the eval split independent of the label?")
    q296_chisq_independence(spark, sf).show()

    print("-- rank fidelity: does int8 quantization scramble the ordering?")
    q297_rank_agreement(spark, sf).orderBy("query_id").show()

    print("-- dispersion index: which event streams are bursty?")
    q298_dispersion_index(spark, sf).orderBy("event_type").show()

    print("-- LSH purity: are the ANN buckets semantically real?")
    q299_lsh_label_purity(spark, sf).show()

    print("-- THE FUNNEL: raw -> dedup -> supply -> allocation -> shards")
    q300_training_funnel(spark, sf).orderBy("source").show()

    print("-- harmonic closeness: influence horizon of the 5 seed suppliers")
    q302_harmonic_closeness(spark, sf).orderBy("seed").show()

    print("-- token Gini: whales-plus-dust inequality per source")
    q303_token_gini(spark, sf).orderBy("source").show(5)


if __name__ == "__main__":
    main()
