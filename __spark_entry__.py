"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf0.001.
``queries()`` — every implemented operator (SURVEY §2.2 + extensions).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
ops whose semantics aren't SQL-expressible; driver then records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver's correctness gate hashes the FIRST 50 entries of queries()
# in dict-insertion order.  _reorder therefore fronts the queries with
# no fully-green row in any committed CORRECTNESS_r*.json (oldest query
# number first), so each round's window automatically rotates through
# the never-yet-verified backlog; _GRADE_FIRST is the static fallback
# (the round-5 window) used only if the history files are unreadable.
_GRADE_FIRST = [
    "q51_pivot",
    "q52_unpivot",
    "q53_sessionize",
    "q54_winnow_fingerprints",
    "q55_correlated_exists",
    "q56_pii_redact",
    "q57_rolling_window",
    "q58_column_profile",
    "q59_fk_integrity",
    "q60_label_centroids",
    "q61_kmeans",
    "q62_hopping_window",
    "q63_analytic_functions",
    "q64_media_knn",
    "q65_null_semantics",
    "q66_decimal_exact",
    "q67_dataset_split",
    "q68_incremental_rollup",
    "q69_contamination_check",
    "q70_stratified_sample",
    "q71_domain_cap",
    "q72_embedding_quantize",
    "q73_corpus_filter",
    "q74_heavy_hitters",
    "q75_approx_quantile_contract",
    "q76_token_shards",
    "q82_mixture_sample",
    "q83_ivf_persisted_probe",
    "q85_doc_chunking",
    "q86_incremental_dedup",
    "q87_sequence_packing",
    "q88_semantic_dedup",
    "q89_hll_merge",
    "q90_theta_overlap",
    "q91_recursive_month_spine",
    "q92_variant_shred",
    "q93_repetition_quality",
    "q98_udtf_table_profile",
    "q99_array_analytics",
    "q100_corpus_report",
    # new this round — never driver-verified yet
    "q101_knn_ivf_refined",
    "q102_curation_pipeline",
    "q103_bloom_incremental_dedup",
    "q104_cohort_retention",
    "q105_funnel",
    "q106_pagerank",
    "q107_min_cost_supplier",
    "q108_excess_share_suppliers",
    "q109_canonical_dedup",
    "q110_scd2_history",
]


def _verified_queries() -> set[str]:
    """Names with a fully-green row (rows+schema+hash) in any committed
    round history file."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(d, dict):
            continue
        for name, row in d.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                seen.add(name)
    return seen


def _reorder(d: dict) -> dict:
    """Rotate never-driver-verified queries into the graded first-50
    window, oldest query number first; verified queries follow in their
    registration order."""
    import re

    verified = _verified_queries()
    if not verified:  # history unreadable — static round-5 fallback
        out = {k: d[k] for k in _GRADE_FIRST if k in d}
        out.update({k: v for k, v in d.items() if k not in out})
        return out

    def qnum(name: str) -> int:
        m = re.match(r"q(\d+)", name)
        return int(m.group(1)) if m else 10**9

    backlog = sorted((k for k in d if k not in verified), key=qnum)
    out = {k: d[k] for k in backlog}
    # verified tail in query-number order too: queries() and
    # oracle_sql() then agree positionally regardless of each module
    # dict's registration order
    for k in sorted((k for k in d if k not in out), key=qnum):
        out[k] = d[k]
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary + factory UDF end-to-end
    on /root/testdata/sf0.001."""
    from adhesive_spark.queries.udf_queries import q23_udf_python_agg

    return q23_udf_python_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from adhesive_spark.queries.relational import RELATIONAL_QUERIES
    from adhesive_spark.queries.udf_queries import UDF_QUERIES

    out: dict[str, Callable] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(UDF_QUERIES)
    try:
        from adhesive_spark.queries.pipeline_queries import PIPELINE_QUERIES

        out.update(PIPELINE_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.advanced_queries import ADVANCED_QUERIES

        out.update(ADVANCED_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.curation_queries import CURATION_QUERIES

        out.update(CURATION_QUERIES)
    except ImportError:
        pass
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    from adhesive_spark.queries.relational import RELATIONAL_ORACLES
    from adhesive_spark.queries.udf_queries import UDF_ORACLES

    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(UDF_ORACLES)
    try:
        from adhesive_spark.queries.pipeline_queries import PIPELINE_ORACLES

        out.update(PIPELINE_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.advanced_queries import ADVANCED_ORACLES

        out.update(ADVANCED_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.curation_queries import CURATION_ORACLES

        out.update(CURATION_ORACLES)
    except ImportError:
        pass
    return _reorder(out)
