"""One-pass pipeline monitoring via ``DataFrame.observe``.

A 100 TB curation job cannot afford a second scan to know what it just
did — "how many rows, how many nulls, what was the quality mass" must
ride the SAME action that produces the output.  Spark's Observation API
attaches named aggregate expressions to a plan node; they are computed
by accumulators during whatever action the caller runs next (a write, a
collect), costing zero extra passes and zero extra shuffles.

This is the Spark-native analog of the metrics side-channel a native
engine would thread through its operators; the reference has no
counterpart (its 6-row demo prints results directly), so this module is
extension surface (SURVEY §2.3 — pipeline operations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def attach_metrics(
    df: DataFrame,
    metrics: dict[str, Column],
    *,
    name: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``'s plan.

    Returns ``(df, observation)``; run any ONE action on the returned
    DataFrame, then read ``observation.get`` (a dict) — the values were
    gathered during that action by accumulators, not by a second scan.

    Each metric must be an aggregate expression (the same rule as
    ``observe``); non-aggregates raise at attach time.
    """
    obs = Observation(name) if name else Observation()
    keys = list(metrics)
    observed = df.observe(obs, *[metrics[k].alias(k) for k in keys])
    return observed, obs


def corpus_metrics(text_col: str = "text") -> dict[str, Column]:
    """The standard curation-job counters: row count, null/empty texts,
    total characters, and quality mass (sum of the rounded q-score, so
    mean quality = quality_mass / rows at read time) — all computable as
    accumulator-friendly aggregates."""
    from adhesive_spark.operators.text import quality_score, scaled_long

    c = F.col(text_col)
    return {
        "n_rows": F.count(F.lit(1)),
        "n_null_text": F.count_if(c.isNull() | (F.length(c) == 0)),
        "total_chars": F.coalesce(F.sum(F.length(c)), F.lit(0)).cast("long"),
        "quality_mass": F.coalesce(
            F.sum(scaled_long(quality_score(c), 4)), F.lit(0)
        ).cast("long"),
    }


def observed_write(
    df: DataFrame,
    path: str,
    *,
    metrics: dict[str, Column],
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write ``df`` as parquet and return the metric values gathered
    DURING the write — the one-pass "write + audit row" primitive.  The
    caller persists the returned dict next to the output (manifest,
    metastore comment, job log); nothing here re-reads the data."""
    observed, obs = attach_metrics(df, metrics)
    observed.write.mode(mode).parquet(path)
    return dict(obs.get)
