"""A/B: eager vs lazy localCheckpoint for one registered query
(VERDICT r12 item 3 — cheapen the eager-checkpoint boundary).

Variant A runs the query as written (eager=True sites pay a separate
serial job before the main action).  Variant B monkeypatches
``DataFrame.localCheckpoint`` so every site runs with ``eager=False``:
the RDD is still marked for checkpointing (persisted on first compute,
lineage truncated), but materialization rides INSIDE the query's one
action instead of a pre-paid serial job.  Result rows must be
identical (CHECK_EQUAL).

Select the query with $SPARK_GRAFT_AB_QUERY.
"""

from __future__ import annotations

import os
import sys

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import DataFrame  # noqa: E402

CHECK_EQUAL = True

_QUERY = os.environ["SPARK_GRAFT_AB_QUERY"]


def _resolve():
    import __spark_entry__ as entry

    return entry.queries()[_QUERY]


_orig_ckpt = DataFrame.localCheckpoint


def eager_shape(spark, sf_dir):
    return _resolve()(spark, sf_dir)


def lazy_shape(spark, sf_dir):
    def lazy_ckpt(self, eager=True, storageLevel=None):
        return _orig_ckpt(self, eager=False, storageLevel=storageLevel)

    DataFrame.localCheckpoint = lazy_ckpt
    try:
        df = _resolve()(spark, sf_dir)
    finally:
        DataFrame.localCheckpoint = _orig_ckpt
    return df


VARIANTS = {"eager": eager_shape, "lazy": lazy_shape}
