"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas iterators.

Decode is REAL for every codec-free container: PPM (P6) and uncompressed
24-bit BMP images (`decode_ppm`/`decode_bmp`, nearest-neighbor resize),
RIFF/WAVE PCM audio (`decode_wav`, chunk walker), and concatenated-PPM
video (`decode_video_frames`, per-frame header walk + sampling) — all pure
numpy, each oracle-checked end to end (image_channel_stats /
audio_level_stats / video_frame_stats). Entropy-coded formats (JPEG/PNG/
MP3/H.264) dispatch to PIL when available and otherwise raise — this
container ships no codec libs, and faking those would be dishonest. The
generic feature extractor remains the deterministic byte-histogram
stand-in for a learned encoder.

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


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decode of a binary PPM (P6) image to an (H, W, 3) uint8 array —
    pure numpy, no codec library. Raises ValueError on malformed input."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixel data;
    # '#' comments allowed between tokens
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    need = w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return px.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decode of an uncompressed 24-bit BMP to (H, W, 3) uint8 RGB —
    pure numpy (bottom-up row order and 4-byte row padding handled)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — the deterministic, library-free resampler."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, 3) uint8 RGB array.

    PPM (P6) and uncompressed 24-bit BMP decode for REAL in pure numpy —
    no codec library needed. Other containers (JPEG/PNG/...) dispatch to
    PIL when available and otherwise raise: this container ships no codec
    libs, and faking entropy-coded formats would be dishonest."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as exc:  # pragma: no cover - exercised only w/o PIL
        raise NotImplementedError(
            "JPEG/PNG decode requires PIL/pillow (absent in this container); "
            "PPM and 24-bit BMP decode natively above"
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
    """OPAQUE-payload frame sampling: split the payload into n_frames equal
    byte slices (one output row per frame) — the shape for containers whose
    codec is unavailable. For concatenated-PPM video the REAL parser is
    decode_video_frames/video_frame_stats."""
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


def decode_channel_stats(
    media: DataFrame,
    payload_col: str = "payload",
    resize_to: tuple[int, int] | None = None,
) -> DataFrame:
    """REAL image decode in the pipeline: parse each payload with
    decode_image (PPM/BMP native), optionally resize_nearest to
    `resize_to` = (w, h), and emit per-channel statistics —
    (media_id, width, height, r_mean, g_mean, b_mean). Means are exact
    integer sums divided once (single IEEE division → engine-portable; the
    image_channel_stats / image_resize_stats oracles check the decode —
    and resize index arithmetic — bit-for-bit). Arrow-batched mapInPandas;
    per-batch numpy, never per-row Python in the driver.
    """
    ensure_package_on_executors(media.sparkSession)
    out_schema = (
        "media_id bigint, width int, height int, "
        "r_mean double, g_mean double, b_mean double"
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rabitq_spark.operators.multimodal import decode_image, resize_nearest

        for pdf in batches:
            if pdf.empty:
                continue
            ids, ws, hs, rs, gs, bs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                img = decode_image(bytes(payload))
                if resize_to is not None:
                    img = resize_nearest(img, resize_to[0], resize_to[1])
                h, w = img.shape[:2]
                sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                npx = float(h * w)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                rs.append(float(sums[0]) / npx)
                gs.append(float(sums[1]) / npx)
                bs.append(float(sums[2]) / npx)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.asarray(ws, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                    "r_mean": rs,
                    "g_mean": gs,
                    "b_mean": bs,
                }
            )

    return media.select("media_id", payload_col).mapInPandas(_stats, out_schema)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a RIFF/WAVE payload to (samples, sample_rate) — pure
    numpy chunk walking, no audio library. Supports PCM (format 1) 8-bit
    unsigned and 16-bit signed, mono or interleaved multi-channel (returned
    as (n_frames, n_channels) for multi-channel, 1-D for mono)."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError("only PCM WAV supported")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError("only 8/16-bit PCM supported")
    if n_channels > 1:
        samples = samples[: len(samples) // n_channels * n_channels].reshape(
            -1, n_channels
        )
    return samples, sample_rate


def wav_header_pcm8_mono(n_samples: int, sample_rate: int = 8000) -> bytes:
    """A valid 44-byte RIFF header for 8-bit mono PCM of n_samples — the
    construction half used by tests and the audio_level_stats fixture."""
    data_size = n_samples
    return (
        b"RIFF"
        + (36 + data_size).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")      # PCM
        + (1).to_bytes(2, "little")      # mono
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")  # byte rate (8-bit mono)
        + (1).to_bytes(2, "little")      # block align
        + (8).to_bytes(2, "little")      # bits per sample
        + b"data"
        + data_size.to_bytes(4, "little")
    )


def decode_audio_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode in the pipeline: parse each payload with decode_wav
    and emit (media_id, n_samples, sample_rate, mean_level, peak_level).
    Mean is an exact integer sum divided once (engine-portable; oracle
    audio_level_stats)."""
    ensure_package_on_executors(media.sparkSession)
    out_schema = (
        "media_id bigint, n_samples int, sample_rate int, "
        "mean_level double, peak_level int"
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rabitq_spark.operators.multimodal import decode_wav

        for pdf in batches:
            if pdf.empty:
                continue
            ids, ns, srs, means, peaks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                samples, sr = decode_wav(bytes(payload))
                flat = samples.reshape(-1)
                ids.append(mid)
                ns.append(len(flat))
                srs.append(sr)
                means.append(float(int(flat.sum(dtype=np.int64))) / float(len(flat)))
                peaks.append(int(flat.max()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": np.asarray(ns, dtype=np.int32),
                    "sample_rate": np.asarray(srs, dtype=np.int32),
                    "mean_level": means,
                    "peak_level": np.asarray(peaks, dtype=np.int32),
                }
            )

    return media.select("media_id", payload_col).mapInPandas(_stats, out_schema)


def decode_video_frames(payload: bytes) -> list[np.ndarray]:
    """REAL decode of a concatenated-PPM video container (the codec-free
    analogue of MJPEG: frame = complete P6 record): walk the payload
    parsing each frame's own header, return the list of (H, W, 3) arrays.
    Raises ValueError on a malformed frame boundary."""
    frames = []
    pos, n = 0, len(payload)
    while pos < n:
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"bad frame boundary at offset {pos}")
        # parse this frame's header to learn its pixel size
        tokens, i = [], pos + 2
        while len(tokens) < 3:
            while i < n and payload[i : i + 1].isspace():
                i += 1
            if i < n and payload[i : i + 1] == b"#":
                while i < n and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        i += 1
        w, h, maxval = tokens
        end = i + w * h * 3
        frames.append(decode_ppm(payload[pos:end]))
        pos = end
    return frames


def video_frame_stats(
    media: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sampled video statistics through the REAL container parser:
    decode all frames, keep every k-th, emit (media_id, frame_no, width,
    height, mean_val) — mean is an exact integer sum divided once, so the
    whole decode+sample path is oracle-checkable (video_frame_stats)."""
    ensure_package_on_executors(media.sparkSession)
    out_schema = (
        "media_id bigint, frame_no int, width int, height int, mean_val double"
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rabitq_spark.operators.multimodal import decode_video_frames

        for pdf in batches:
            if pdf.empty:
                continue
            ids, fnos, ws, hs, means = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for fno, img in enumerate(decode_video_frames(bytes(payload))):
                    if fno % every_k != 0:
                        continue
                    h, w = img.shape[:2]
                    total = int(img.sum(dtype=np.int64))
                    ids.append(mid)
                    fnos.append(fno)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(total) / float(h * w * 3))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": np.asarray(fnos, dtype=np.int32),
                    "width": np.asarray(ws, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                    "mean_val": means,
                }
            )

    return media.select("media_id", payload_col).mapInPandas(_stats, out_schema)
