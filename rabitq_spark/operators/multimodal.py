"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas iterators.

The decode step is STUBBED (no image/audio libraries in this container —
see `decode_image`): the Spark-side contract — schema, Arrow binary
transfer, mapInPandas batch shape, partition behavior — is real and tested.
A deterministic fake feature extractor (byte histogram) stands in for a
real CNN/fbank so the pipeline has checkable output.

At 100 TB: binary payloads ride in Parquet alongside metadata, partition
pruning works on the metadata columns, and the per-batch Python cost is one
vectorized pass per Arrow batch (never per-row).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rabitq_spark._dist import ensure_package_on_executors

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, payload binary, "
    "width int, height int, source string"
)

FEATURE_DIM = 16


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: each document's text bytes become an
    opaque binary payload with fake image metadata. Stands in for a real
    (id, jpeg_bytes, exif...) table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 64 + 32).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 24).cast("int").alias("height"),
        F.col("source"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels. STUB: PIL/libvips are not in this
    container; the real implementation is one import away."""
    try:
        from PIL import Image  # noqa: F401  (absent here by design)
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover - exercised only w/o PIL
        raise NotImplementedError(
            "image decode requires PIL/pillow; container ships without it — "
            "the surrounding Spark plumbing (schema, Arrow binary batches, "
            "partitioning) is real and tested with the fake extractor"
        ) from exc


def extract_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-media deterministic feature vector + checksum via mapInPandas.

    Fake-but-deterministic: 16-bin byte histogram (L1-normalized) plus a
    byte-sum checksum. Replace `_featurize` with a real decoder+model; the
    batch shape (iterator of Arrow-backed pandas frames in, frames out) is
    exactly what a GPU-batched encoder wants.
    """
    ensure_package_on_executors(media.sparkSession)
    out_schema = (
        "media_id bigint, media_len int, feat array<float>, byte_sum bigint"
    )

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, lens, sums = [], [], []
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=FEATURE_DIM).astype(np.float64)
                total = hist.sum()
                feats.append(
                    (hist / total if total else hist).astype(np.float32)
                )
                lens.append(len(b))
                sums.append(int(b.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_len": np.asarray(lens, dtype=np.int32),
                    "feat": feats,
                    "byte_sum": np.asarray(sums, dtype=np.int64),
                }
            )

    return media.select("media_id", payload_col).mapInPandas(_featurize, out_schema)


def frame_sample(
    media: DataFrame, n_frames: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling stand-in: split the payload into n_frames equal
    byte slices (one output row per frame). Real frame decode is stubbed the
    same way as decode_image; the explode/repartition shape is the real part."""
    ensure_package_on_executors(media.sparkSession)
    out_schema = "media_id bigint, frame_no int, frame_bytes binary"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_bytes": frames}
            )

    return media.select("media_id", payload_col).mapInPandas(_sample, out_schema)
