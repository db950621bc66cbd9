"""Skew-aware join: explicit key salting.

AQE's skew-join split (enabled in build_spark) handles sort-merge skew
at runtime, but only AFTER a straggler partition materializes, and not
for broadcast-ineligible aggregations feeding the join. Explicit salting
bounds the worst partition up front: the skewed (probe) side gets a
random salt in [0, n); the build side is replicated n× with every salt
value; the join key becomes (key, salt). Shuffle width per key drops by
n at the cost of replicating the build side n× — the standard trade for
whale keys (a celebrity user, an empty-string join key).

Result is IDENTICAL to the unsalted join (verified by oracle q48) —
salting is pure physical rewriting, which is why it belongs in the
operator library rather than in user queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (large, hot-keyed) to ``build`` (smaller) on
    ``on``, spreading each hot key over ``n_salts`` shuffle partitions.

    ``how`` supports inner/left; the build side is replicated, so right/
    full joins would duplicate unmatched build rows — rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    salted = skewed.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    replicated = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")
