"""Pipeline-operator namespace: the one-stop import surface for a user
switching from the reference (each symbol's home module carries the
full scale-shape documentation)."""

from adhesive_spark.operators.asof import asof_join, interval_overlap_join
from adhesive_spark.operators.curation import (
    apply_masking_policy,
    cap_per_group,
    contamination_pairs,
    k_anonymity_screen,
    mixture_sample,
    redact_pii,
    stratified_hash_sample,
    systematic_pps_sample,
    temperature_mixture,
)
from adhesive_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ppjoin_pairs,
    simhash_pairs,
    span_dedup,
)
from adhesive_spark.operators.graph import (
    connected_components,
    dedup_transitive,
    pagerank_integer,
    triangle_count,
)
from adhesive_spark.operators.incremental import (
    apply_cdc,
    merge_rollup,
    rollup_events,
)
from adhesive_spark.operators.quality import (
    column_profile,
    expectation_report,
    fd_violations,
    fk_orphans,
)
from adhesive_spark.operators.similarity import (
    knn_bruteforce,
    knn_lsh,
    quantize_embeddings,
)
from adhesive_spark.operators.text import (
    bigrams,
    chunk_documents,
    fingerprint,
    lang_id,
    pack_sequences,
    quality_score,
    text_profile,
    token_count,
    tokens,
)

__all__ = [
    "asof_join",
    "interval_overlap_join",
    "apply_masking_policy",
    "cap_per_group",
    "contamination_pairs",
    "k_anonymity_screen",
    "mixture_sample",
    "redact_pii",
    "stratified_hash_sample",
    "systematic_pps_sample",
    "temperature_mixture",
    "dedup_exact",
    "dedup_minhash",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ppjoin_pairs",
    "simhash_pairs",
    "span_dedup",
    "connected_components",
    "dedup_transitive",
    "pagerank_integer",
    "triangle_count",
    "apply_cdc",
    "merge_rollup",
    "rollup_events",
    "column_profile",
    "expectation_report",
    "fd_violations",
    "fk_orphans",
    "knn_bruteforce",
    "knn_lsh",
    "quantize_embeddings",
    "bigrams",
    "chunk_documents",
    "fingerprint",
    "lang_id",
    "pack_sequences",
    "quality_score",
    "text_profile",
    "token_count",
    "tokens",
]
