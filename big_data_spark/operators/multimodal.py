"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (north-star operator set; no counterpart in the reference).

Design for 100 TB of media:
- payloads ride in a ``binary`` column next to typed metadata
  (modality, codec, declared dims), so relational pruning/filtering
  happens on metadata without touching bytes;
- decode / feature-extract runs via ``mapInPandas`` — Arrow batches,
  one Python worker per core, no driver involvement;
- ``spark.sql.files.maxPartitionBytes`` (session.py) bounds the bytes
  per task so decode tasks can't OOM on media-heavy partitions.

The actual codec step is STUBBED (Pillow/ffmpeg are not in this
container): ``decode_fn=None`` raises NotImplementedError at the
exact integration point, and tests inject ``fake_decode`` — a
deterministic stand-in with the real schema, batching, and
partitioning behavior.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("codec", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("phash", StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def attach_fake_payloads(docs: DataFrame, modality: str = "image") -> DataFrame:
    """documents -> media table: deterministic binary payloads derived
    from the text (stands in for real blobs; plumbing is real)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit("fake/v1").alias("codec"),
        F.encode("text", "UTF-8").alias("payload"),
    ).withColumn("n_bytes", F.octet_length("payload").cast("long"))


def fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic decode stand-in: dims from the digest, phash from
    content — same signature a Pillow-backed decoder would have."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return width, height, digest[:16]


def extract_image_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, str]] | None = None,
) -> DataFrame:
    """Arrow-batched image feature extraction over the payload column.

    ``decode_fn`` is the per-image codec hook; production would pass
    e.g. a Pillow loader. None -> NotImplementedError (codec libs not
    available in this environment).
    """
    if decode_fn is None:
        raise NotImplementedError(
            "no image codec available in this environment; inject decode_fn "
            "(e.g. a PIL.Image-based loader) to enable real decoding"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_fn(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": pdf["n_bytes"].values,
                    "phash": [d[2] for d in decoded],
                }
            )

    src = media.select("media_id", "payload", "n_bytes")
    # Decode cost dominates payload-shuffle cost, so starve no core:
    # when the scan yields fewer partitions than the cluster has slots
    # (single-file inputs, heavily filtered scans), rebalance BEFORE
    # the Python stage — otherwise one Arrow worker decodes everything
    # serially. No-op when the scan is already wide (the 100 TB case).
    sc = media.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    return src.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling stub: emits every-Nth-chunk "frames" from
    the payload — the real implementation would seek keyframes via
    ffmpeg. One-to-many mapInPandas (UDTF-shaped) with bounded
    fan-out per media row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(
                        bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


def sample_frames_via_udtf(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Same frame sampling as ``sample_frames``, expressed as a real
    Python UDTF + LATERAL join (Spark 4 table-function surface): one
    input row fans out to N frame rows inside the join, so downstream
    operators can filter/project frames before anything materializes.

    The mapInPandas form stays the hot path (Arrow batches); this
    variant exists for the table-function API surface — e.g. SQL users
    calling ``LATERAL sample_frames(media_id, payload)`` — and is
    pinned equal to it by tests/test_multimodal.py."""
    from pyspark.sql.functions import udtf

    spark = media.sparkSession
    n, k = every_n_bytes, max_frames

    @udtf(returnType=FRAME_SAMPLE_SCHEMA)
    class SampleFrames:
        def eval(self, media_id, payload):  # noqa: ANN001 -- UDTF contract
            for i in range(min(k, max(1, len(payload) // n))):
                yield media_id, i, bytes(payload[i * n : (i + 1) * n])

    # per-call names so concurrent callers in one session can't
    # clobber each other's view/function registration
    import uuid

    tag = uuid.uuid4().hex[:12]
    fn_name, view_name = f"sample_frames_{tag}", f"media_for_udtf_{tag}"
    spark.udtf.register(fn_name, SampleFrames)
    media.select("media_id", "payload").createOrReplaceTempView(view_name)
    return spark.sql(
        f"""
        SELECT s.media_id, s.frame_idx, s.frame_bytes
        FROM {view_name} m,
             LATERAL {fn_name}(m.media_id, m.payload) s
        """
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic resize stand-in with the same contract a real
    transcoder has (payload -> payload at target dims): re-encode a
    content-derived body whose length scales with the pixel count so
    downstream byte accounting behaves realistically."""
    digest = hashlib.md5(payload).hexdigest().encode()
    body = digest * (1 + (target_w * target_h) // (16 * len(digest)))
    return b"%dx%d|" % (target_w, target_h) + body[: max(8, (target_w * target_h) // 16)]


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize over the payload column — the
    bandwidth-bound preprocessing step of a multimodal training
    pipeline (thumbnails / fixed training resolution). Same codec
    policy as extract_image_features: ``resize_fn`` is the pluggable
    transcoder (Pillow resize+re-encode in production, fake_resize in
    this environment); None raises so stubbed coverage can't be
    mistaken for real decode. Map-only per batch; output bytes are
    ~(target pixels / source pixels) of input, so running it early
    shrinks every downstream shuffle."""
    if resize_fn is None:
        raise NotImplementedError(
            "no image codec available in this environment; inject "
            "resize_fn (e.g. a Pillow resize+encode) to enable real resizing"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_fn(p, target_w, target_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    src = media.select("media_id", "payload")
    sc = media.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    return src.mapInPandas(batches, schema=RESIZED_SCHEMA)
