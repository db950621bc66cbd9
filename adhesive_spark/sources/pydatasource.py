"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic document corpus generated partition-parallel
on the executors.

The reference's only source is an in-memory Arrow batch registered as a
table (examples/adhesive.rs:17-19); this is the Spark-4-native way to
own a SOURCE end to end — schema, partition planning, and per-partition
generation all in Python, while Spark handles distribution, pruning and
the Arrow transport. The corpus is seeded per document (not per
partition), so the SAME rows come back for any partition count — the
property that makes a generated source usable in reproducible tests and
benchmarks.

Usage::

    from adhesive_spark.sources.pydatasource import register_synthetic_docs
    register_synthetic_docs(spark)
    df = (spark.read.format("synthetic_docs")
          .option("n_docs", 10_000).option("partitions", 32).load())
"""

from __future__ import annotations

import random

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_WORDS = (
    "the data spark engine corpus token stream shuffle partition scan "
    "join filter window batch vector column row group file format "
    "quality language model training sample shard merge sketch"
).split()


def _gen_doc(seed: int, doc_id: int) -> tuple:
    """One deterministic document row. Shared by the batch and streaming
    readers — the equality contract between them (tested) is exactly
    'both call this with the same (seed, doc_id)'. Per-DOCUMENT seeding,
    never per-partition: the corpus is identical under any partitioning."""
    rng = random.Random(seed * 1_000_003 + doc_id)
    n = rng.randint(20, 120)
    text = " ".join(rng.choice(_WORDS) for _ in range(n))
    return (doc_id, f"src{doc_id % 4}", n, text)


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — options: n_docs, partitions, seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, source string, n_words int, text string"

    def reader(self, schema) -> "SyntheticDocsReader":
        # pushdown is OPT-IN per load(): Spark caches one planned read
        # per relation, and a pushdown-planned partition set would be
        # (incorrectly) reused by a later FILTERLESS scan of the same
        # load() — so only a load that promises single-scan usage gets
        # the pushdown-capable reader (see PushdownSyntheticDocsReader).
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return PushdownSyntheticDocsReader(self.options)
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))
        # generated doc_id range [lo, hi); pushdown subclass clamps it
        self.lo, self.hi = 0, self.n_docs
    def partitions(self):
        # contiguous doc-id ranges over the (possibly clamped) [lo, hi):
        # planning is pure metadata, each executor generates only its
        # slice, and a fully-filtered range plans ZERO work.  Bounds
        # ride IN the partition (the reader instance that runs read()
        # on the executor is a pre-planning pickle, so planning state
        # must travel through the partition object).
        span = max(0, self.hi - self.lo)
        n_parts = min(self.n_parts, span) or 1
        return [
            _DocRangePartition(
                self.lo + span * i // n_parts,
                self.lo + span * (i + 1) // n_parts,
                self.seed,
            )
            for i in range(n_parts)
        ]

    def read(self, partition):
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_doc(partition.seed, doc_id)


class PushdownSyntheticDocsReader(SyntheticDocsReader):
    """Spark-4.1 filter-pushdown variant, selected by
    ``.option("pushdown", "true")`` (needs the session conf
    ``spark.sql.python.filterPushdown.enabled=true``, set by
    build_spark): doc_id comparisons clamp the GENERATED [lo, hi)
    range, so planning prunes whole partitions before any row exists —
    the Python-source analog of parquet min/max pruning.  Handled
    filters are consumed (range semantics are exact, no re-check
    needed); anything else is returned for Spark to evaluate
    post-scan.

    Opt-in because of a Spark relation-cache sharp edge: the planned
    (clamped) partition set is cached per load(), so a later scan of
    the SAME load() with different/absent doc_id filters can reuse the
    wrong plan.  Use one load() per query when pushdown is on; the
    default reader (no pushFilters) is immune."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        # rebuild the clamp from THIS scan's filters only
        self.lo, self.hi = 0, self.n_docs
        remaining = []
        for f in filters:
            if getattr(f, "attribute", None) != ("doc_id",) or not isinstance(
                getattr(f, "value", None), int
            ):
                remaining.append(f)
                continue
            v = f.value
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)
            else:
                remaining.append(f)
        return remaining


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)


class _DocRangePartition(InputPartition):
    def __init__(self, lo: int, hi: int, seed: int):
        self.lo, self.hi, self.seed = lo, hi, seed


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Micro-batched twin of :class:`SyntheticDocsReader`: the offset is
    simply the next doc_id. ``latestOffset`` is derived ONLY from the
    source's own bound (``n_docs``), never from reader instance state —
    a restarted reader loses its fields but the checkpointed start
    offset must still be <= every future latest, or Spark sees an offset
    regression and recovery re-emits committed ranges. Rows for a given
    offset range are deterministic (per-document seeding), so replaying
    a batch after a crash produces identical data. ``batch_docs`` bounds
    the rows per planned partition, not per micro-batch (per-batch
    admission control is not part of this API)."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_docs = max(1, int(options.get("batch_docs", 100)))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next_doc": 0}

    def latestOffset(self) -> dict:
        # everything up to the corpus bound is available; MONOTONE by
        # construction across restarts (state-free)
        return {"next_doc": self.n_docs}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["next_doc"], end["next_doc"]
        if hi <= lo:
            return [_DocRangePartition(lo, lo, self.seed)]
        return [
            _DocRangePartition(i, min(i + self.batch_docs, hi), self.seed)
            for i in range(lo, hi, self.batch_docs)
        ]

    def read(self, partition):
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_doc(partition.seed, doc_id)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: generation is stateless


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int, n_tokens: int):
        self.path = path
        self.n_rows = n_rows
        self.n_tokens = n_tokens


class ShardedJsonlDataSource(DataSource):
    """Write-side Python DataSource: the TRAINING-SHARD EXPORT sink —
    each task streams its partition to one ``shard-<uuid>.jsonl`` file
    and reports (path, rows, tokens) as its commit message; the DRIVER
    commit writes ``manifest.json`` (atomically, temp + os.replace)
    listing every committed shard with its row/token counts.  The
    manifest is the atomicity boundary: a failed/speculative task's
    orphan file is never listed, so readers that honor the manifest
    (the loader side of every LLM data pipeline) see exactly-once
    output.  ``append`` MERGES the new shards into the existing
    manifest; ``overwrite`` publishes only the new shards and then
    deletes the previously listed files.  ``abort`` removes the
    written files best-effort.

    Usage::

        df.write.format("sharded_jsonl").mode("append")
          .option("path", "/out/dir").option("text_col", "text").save()
    """

    @classmethod
    def name(cls) -> str:
        return "sharded_jsonl"

    def writer(self, schema, overwrite: bool):
        return ShardedJsonlWriter(self.options, schema, overwrite)


class ShardedJsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sharded_jsonl requires .option('path', ...)")
        self.text_col = options.get("text_col", "text")
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"shard-{uuid.uuid4().hex}.jsonl")
        n_rows = 0
        n_tokens = 0
        with open(shard, "w") as f:
            for row in iterator:
                # recursive: nested Rows become dicts, not repr strings
                d = row.asDict(recursive=True)
                n_rows += 1
                text = d.get(self.text_col)
                if isinstance(text, str):
                    n_tokens += len(text.split())
                f.write(json.dumps(d, default=str) + "\n")
        return _ShardCommit(shard, n_rows, n_tokens)

    def commit(self, messages):
        import json
        import os

        new = [
            {"path": m.path, "rows": m.n_rows, "tokens": m.n_tokens}
            for m in messages
            if m is not None
        ]
        mpath = os.path.join(self.path, "manifest.json")
        prior = []
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    prior = json.load(f).get("shards", [])
            except (OSError, ValueError):
                prior = []
        shards = (prior + new) if not self.overwrite else new
        manifest = {
            "shards": shards,
            "total_rows": sum(s["rows"] for s in shards),
            "total_tokens": sum(s["tokens"] for s in shards),
        }
        # atomic publish: readers see the old or the new manifest,
        # never a torn one
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)
        if self.overwrite:
            # old shards vanish only AFTER the new manifest is live
            keep = {s["path"] for s in shards}
            for p in prior:
                if p["path"] not in keep:
                    try:
                        os.remove(p["path"])
                    except OSError:
                        pass

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def register_sharded_jsonl(spark) -> None:
    spark.dataSource.register(ShardedJsonlDataSource)
