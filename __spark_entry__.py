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
# (the round-6 window) used only if the history files are unreadable.
_GRADE_FIRST = [
    "q111_fuzzy_name_join",
    "q112_global_sales_opportunity",
    "q113_equidepth_histogram",
    "q114_group_exact_sample",
    "q115_gap_fill_interpolate",
    "q116_ppjoin_pairs",
    "q117_late_shipment_check",
    "q118_customer_distribution",
    "q119_top_supplier",
    "q120_discounted_revenue",
    "q121_nation_profit",
    "q122_weighted_sample",
    "q123_mad_outliers",
    "q124_top_p_sources",
    "q125_lateral_topk",
    "q126_temperature_mixture",
    "q127_cluster_blocked_neardup",
    "q128_winsorize",
    "q129_corpus_diff",
    "q130_boilerplate_spans",
    "q131_triangle_count",
    "q132_char_diversity",
    "q133_paragraph_dedup",
    "q134_vocab_growth",
    "q135_skew_profile",
    "q136_length_bucketing",
    "q137_important_parts",
    "q138_priority_shipping",
    "q139_supplier_part_counts",
    "q140_latency_bands",
    "q141_inverted_index",
    "q142_freq_spectrum",
    "q143_media_batch_plan",
    "q144_udf_pandas_aggregate",
    "q145_udf_table_function",
    "q146_rarity_score",
    "q147_leakage_safe_split",
    "q148_deletion_propagation",
    "q149_inverted_index_persisted",
    "q150_drift_monitor",
    "q151_hard_negatives",
    "q152_ann_recall",
    "q153_retrieval_mrr",
    "q154_minhash_persisted_probe",
    "q155_media_dedup",
    "q156_oov_rate",
    "q157_semantic_drift",
    "q158_embedding_qa",
    "q159_event_transitions",
    "q160_dup_cluster_sizes",
]


def _verified_queries() -> set[str]:
    """Names with a fully-green row (rows+schema+hash) in any committed
    round history file, unioned with the builder-maintained
    VERIFIED.json ledger (consulted FIRST so rotation does not depend
    on the driver's CORRECTNESS_r*.json artifacts being committed)."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    try:
        with open(os.path.join(here, "VERIFIED.json")) as f:
            ledger = json.load(f)
        if isinstance(ledger, dict):
            seen.update(n for n in ledger.get("verified", []) if isinstance(n, str))
    except (OSError, ValueError):
        pass
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


def _last_green_rounds() -> dict[str, int]:
    """name -> HIGHEST round number whose committed CORRECTNESS_r*.json
    records a fully-green row. Queries green only via the VERIFIED.json
    ledger (no readable file) are absent — treated as round 0, i.e.
    oldest, by the post-coverage cycling below."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        rnd = int(m.group(1)) if m else 0
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
                last[name] = max(last.get(name, 0), rnd)
    return last


def _reorder(d: dict) -> dict:
    """Rotate never-driver-verified queries into the graded first-50
    window, oldest query number first; verified queries follow in their
    registration order.

    Once the backlog is EMPTY (full-registry coverage, reached in round
    11), rotation switches to a regression ratchet: the whole registry
    is ordered by the round each query last graded green (oldest
    first, query number as tiebreak), so every future round's graded
    window re-proves the 50 longest-unchecked queries against drift
    instead of grading nothing new. Each driver round then bumps its
    window to newest and the cycle self-advances."""
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
    if not backlog:
        last = _last_green_rounds()
        return {
            k: d[k]
            for k in sorted(d, key=lambda k: (last.get(k, 0), qnum(k)))
        }
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
    try:
        from adhesive_spark.queries.scale_queries import SCALE_QUERIES

        out.update(SCALE_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.sketch_queries import SKETCH_QUERIES

        out.update(SKETCH_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.eval_queries import EVAL_QUERIES

        out.update(EVAL_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.training_queries import TRAINING_QUERIES

        out.update(TRAINING_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.audit_queries import AUDIT_QUERIES

        out.update(AUDIT_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.metrology_queries import (
            METROLOGY_QUERIES,
        )

        out.update(METROLOGY_QUERIES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.estimator_queries import (
            ESTIMATOR_QUERIES,
        )

        out.update(ESTIMATOR_QUERIES)
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
    try:
        from adhesive_spark.queries.scale_queries import SCALE_ORACLES

        out.update(SCALE_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.sketch_queries import SKETCH_ORACLES

        out.update(SKETCH_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.eval_queries import EVAL_ORACLES

        out.update(EVAL_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.training_queries import TRAINING_ORACLES

        out.update(TRAINING_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.audit_queries import AUDIT_ORACLES

        out.update(AUDIT_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.metrology_queries import (
            METROLOGY_ORACLES,
        )

        out.update(METROLOGY_ORACLES)
    except ImportError:
        pass
    try:
        from adhesive_spark.queries.estimator_queries import (
            ESTIMATOR_ORACLES,
        )

        out.update(ESTIMATOR_ORACLES)
    except ImportError:
        pass
    return _reorder(out)
