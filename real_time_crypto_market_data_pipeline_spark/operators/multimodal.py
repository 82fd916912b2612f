"""Multimodal-column operators (SURVEY 2.7 X5).

Images / audio / video ride through the engine as opaque ``binary``
payloads plus a typed metadata struct - the Spark-side plumbing
(schema, partition sizing, Arrow batch shape) is real and tested; the
actual codec work is stubbed because no image/audio libraries exist in
this container (each stub is a deterministic fake or a clearly marked
NotImplementedError, swap-in points for PIL/ffmpeg/torchaudio).

Scale notes (100 TB of media):
- payloads stay in executor memory only per Arrow batch;
  ``maxRecordsPerBatch`` bounds the batch byte size (a 10 MB image x
  10k default batch rows would OOM - size batches by bytes, not rows).
- decode/feature-extract run in ``mapInPandas`` so one Python worker
  per core streams batches; nothing ever collects to the driver.
- metadata lives in a separate narrow struct column so metadata-only
  queries (count by codec, filter by dims) prune the binary column
  entirely at the parquet scan - check ReadSchema in .explain().
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id LONG, kind STRING, payload BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT, "
    "n_frames: INT, sample_rate: INT, n_bytes: LONG>"
)

FEATURE_SCHEMA_DDL = (
    "media_id LONG, kind STRING, sha256 STRING, n_bytes LONG, "
    "feat ARRAY<DOUBLE>"
)

THUMB_SCHEMA_DDL = "media_id LONG, thumb BINARY, thumb_w INT, thumb_h INT"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table synthesized from the documents table.

    Text bytes stand in for an encoded payload; metadata fields derive
    from the payload so tests can assert exact values. This is the
    ingestion adapter's output schema - a real pipeline would read
    (path, bytes) via ``binaryFile`` format into the same shape.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.col("doc_id") % 64 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
            F.when(kind == "video", (F.col("doc_id") % 30 + 1))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("n_frames"),
            F.when(kind == "audio", F.lit(16_000))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("sample_rate"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, kind: str) -> bytes:
    """Codec swap-in point. A real build dispatches to PIL / ffmpeg /
    torchaudio here; this environment has none of them."""
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "install PIL/ffmpeg/torchaudio and replace decode_stub"
    )


def _fake_features(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: unit-normalized doubles
    derived from the payload digest (stable across runs and partitionings)."""
    h = hashlib.sha256(payload).digest()
    vals = [struct.unpack("<I", h[4 * i : 4 * i + 4])[0] / 2**32 for i in range(dims)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def extract_features(media: DataFrame, dims: int = 8) -> DataFrame:
    """Feature extraction over Arrow batches via ``mapInPandas``.

    The per-batch loop is where a vectorized model call goes (one
    inference per batch, not per row). Output drops the payload so the
    wide binary column dies at this stage boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p), dims) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feat": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA_DDL)


def resize_thumbnails(media: DataFrame, max_bytes: int = 64) -> DataFrame:
    """Resize/thumbnail stub: deterministic byte-truncation standing in
    for a real resampler, preserving the (payload in -> smaller payload
    out) batch shape and the metadata recompute."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [bytes(p)[:max_bytes] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": [min(int(w), 16) for w in pdf["meta"].map(lambda m: m["width"])],
                    "thumb_h": [min(int(h), 16) for h in pdf["meta"].map(lambda m: m["height"])],
                }
            )

    return media.mapInPandas(run, schema=THUMB_SCHEMA_DDL)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: emits one row per kept frame
    index - pure metadata fan-out (sequence + explode), no Python; the
    per-frame decode would join this against the payload later."""
    video = media.where(F.col("kind") == "video")
    frame_idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    )
    return video.select(
        "media_id", frame_idx.alias("frame_idx"), F.col("meta.n_frames").alias("n_frames")
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup - must never touch the payload column
    (column pruning keeps the binary out of the scan)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("meta.n_bytes").cast("long").alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
    )


def read_binary_files(spark, path: str, kind: str = "image") -> DataFrame:
    """Ingestion adapter: a directory of media files -> the MEDIA schema.

    ``binaryFile`` format reads (path, modificationTime, length,
    content) with content as BinaryType - the real 100 TB entry point
    (object-store listings partition by prefix). Metadata fields that
    need codec probing are left 0 for the decode stage to fill.
    """
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.abs(F.xxhash64(F.col("path"))).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.element_at(F.split(F.col("path"), "\\."), -1).alias("format"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit(0).cast("int").alias("sample_rate"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
