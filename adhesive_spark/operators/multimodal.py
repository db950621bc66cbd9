"""Multimodal column conventions + processing plumbing (SURVEY §2.3).

Media is carried as an opaque ``binary`` payload column plus a typed
metadata struct — the lakehouse-standard layout for image/audio/video at
scale (payload stays columnar, metadata prunable/pushdown-able):

    MEDIA_SCHEMA = struct<
        media_id: long, media_type: string, payload: binary,
        meta: struct<mime: string, n_bytes: long, source: string>>

Decode / feature-extract run as Arrow-batched ``mapInPandas`` — the
correct shape for per-item Python compute over large binary columns
(no row-at-a-time pickling; batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``).

The image/audio codecs are NOT available in this environment, so the
actual byte decoding is STUBBED: ``decode_media`` computes real,
deterministic metadata (sizes, content hash, fake dimensions derived
from the hash) and raises ``NotImplementedError`` only if a real codec
is requested (``codec="real"``). The Spark-side plumbing — schema,
batching, partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media rows from the documents table (the
    container has no binary fixtures): payload = utf-8 bytes of the text
    head; media_type round-robins image/audio/video."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.substring(F.col(text_col), 1, 256), "utf-8").alias("payload"),
        F.struct(
            F.concat(mt, F.lit("/fake")).alias("mime"),
            F.length(F.encode(F.substring(F.col(text_col), 1, 256), "utf-8"))
            .cast("long")
            .alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, *, codec: str = "stub") -> DataFrame:
    """Decode payloads to typed features via Arrow-batched mapInPandas.

    ``codec="stub"`` derives deterministic pseudo-dimensions from the
    payload hash (the plumbing under test); ``codec="real"`` is the seam
    where PIL/ffmpeg/soundfile would plug in — unavailable here, so it
    raises ``NotImplementedError``.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not available in this "
            "environment; use codec='stub' for the plumbing path"
        )

    # Per-item Python decode is the CPU-dense stage: fan out before it.
    from adhesive_spark.sources.registry import ensure_parallelism

    df = ensure_parallelism(df)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas, widths, heights, frames, sizes, durs = [], [], [], [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if payload is None:
                    shas.append(None)
                    widths.append(None)
                    heights.append(None)
                    frames.append(None)
                    sizes.append(None)
                    durs.append(None)
                    continue
                b = bytes(payload)
                h = hashlib.sha256(b).digest()
                sizes.append(len(b))
                shas.append(h.hex()[:16])
                # Deterministic fake dimensions from the content hash —
                # stands in for the codec's real width/height/frames.
                widths.append(64 + h[0] % 192 if mtype in ("image", "video") else None)
                heights.append(64 + h[1] % 192 if mtype in ("image", "video") else None)
                frames.append(1 + h[2] % 120 if mtype == "video" else None)
                durs.append(
                    1000 + (h[3] * 256 + h[4]) % 60000 if mtype == "audio" else None
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                    "content_sha": shas,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def media_embedding(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """Attach a deterministic feature vector derived from the decoded
    content hash — the stub stand-in for a real image/audio encoder
    (the seam where a CLIP-style model would run as a pandas UDF). One
    byte of the sha per dimension, scaled to [0,1]; pure built-ins so
    the downstream similarity stack stays oracle-checkable."""
    vec = F.array(
        *[
            (
                F.conv(
                    F.substring(F.col("content_sha"), 2 * i + 1, 2), 16, 10
                ).cast("double")
                / 255.0
            )
            for i in range(dim)
        ]
    )
    return decoded.withColumn("embedding", vec)


def audio_chunk_plan(decoded: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio segmentation plan: one row per fixed-length chunk with its
    [start, end) millisecond bounds — the windowing step before a
    speech/audio encoder. Pure built-ins (sequence + explode), the audio
    twin of :func:`frame_sample_plan`; the last chunk is truncated to
    the clip duration."""
    auds = decoded.where(
        (F.col("media_type") == "audio") & F.col("duration_ms").isNotNull()
    )
    return auds.select(
        "media_id",
        "duration_ms",
        F.explode(
            F.sequence(
                F.lit(0), F.col("duration_ms") - 1, F.lit(chunk_ms)
            )
        ).alias("chunk_start_ms"),
    ).withColumn(
        "chunk_end_ms",
        F.least(
            F.col("chunk_start_ms") + F.lit(chunk_ms), F.col("duration_ms")
        ),
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index —
    pure built-ins (sequence + explode), no Python."""
    vids = decoded.where(
        (F.col("media_type") == "video") & F.col("n_frames").isNotNull()
    )
    return vids.select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
