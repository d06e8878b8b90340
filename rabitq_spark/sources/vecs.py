"""fvecs / ivecs / u64vecs file sources and sinks (SURVEY.md §2.1 S1/S2/S4/S5).

Format (reference src/utils.rs:280-330): per record, a little-endian u32
dimension header followed by dim elements (4-byte f32/i32/u32, or 8-byte u64
for u64vecs).

Spark shape: `spark.read.format("binaryFile")` brings each file in as one
binary row; a mapInPandas decoder fans it out to (id, vec) rows. Fine for
the model-artifact files the reference uses (base/centroids/groundtruth);
genuinely huge vector sets belong in Parquet (the engine's native format) —
a one-shot `convert_vecs_to_parquet` covers migration. Writers are
driver-side (these files are small sidecar artifacts; big data goes to
Parquet via df.write).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rabitq_spark._dist import ensure_package_on_executors

_ELEM = {
    "fvecs": (np.float32, "array<float>"),
    "ivecs": (np.int32, "array<int>"),
    "u64vecs": (np.uint64, "array<bigint>"),
    # SIFT1B-style byte vectors; u8 payload surfaces as smallint (Spark has
    # no unsigned byte — tinyint would wrap 128..255)
    "bvecs": (np.uint8, "array<smallint>"),
}


def decode_vecs_bytes(buf: bytes, kind: str) -> list[np.ndarray]:
    """Decode a whole .?vecs buffer into a list of numpy vectors."""
    dtype, _ = _ELEM[kind]
    itemsize = np.dtype(dtype).itemsize
    out = []
    off = 0
    n = len(buf)
    while off + 4 <= n:
        (dim,) = struct.unpack_from("<I", buf, off)
        off += 4
        end = off + dim * itemsize
        if end > n:
            raise ValueError(f"truncated {kind} record at offset {off}")
        out.append(np.frombuffer(buf, dtype=dtype, count=dim, offset=off))
        off = end
    return out


def read_vecs(spark: SparkSession, path: str, kind: str = "fvecs") -> DataFrame:
    """Read .fvecs/.ivecs/.u64vecs file(s) to (id BIGINT, vec ARRAY<...>).

    ids are assigned per file in record order (matching the reference's
    implicit row ids, src/utils.rs:280-303).
    """
    ensure_package_on_executors(spark)
    _, spark_type = _ELEM[kind]
    schema = f"id bigint, vec {spark_type}"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                vecs = decode_vecs_bytes(bytes(row["content"]), kind)
                if kind == "u64vecs":
                    vecs = [v.view(np.int64) for v in vecs]
                elif kind == "bvecs":
                    vecs = [v.astype(np.int16) for v in vecs]
                yield pd.DataFrame(
                    {"id": np.arange(len(vecs), dtype=np.int64), "vec": vecs}
                )

    binary = spark.read.format("binaryFile").load(path).select("content")
    return binary.mapInPandas(_decode, schema)


def write_vecs(path: str, vectors: "np.ndarray | list", kind: str = "fvecs") -> None:
    """Driver-side .?vecs writer (reference write_vecs/write_matrix,
    src/utils.rs:333-364): u32 dim header + payload per record."""
    dtype, _ = _ELEM[kind]
    with open(path, "wb") as f:
        for v in vectors:
            arr = np.asarray(v, dtype=dtype)
            f.write(struct.pack("<I", arr.size))
            f.write(arr.tobytes())


def convert_vecs_to_parquet(
    spark: SparkSession, src: str, dst: str, kind: str = "fvecs"
) -> None:
    """One-shot migration: .?vecs file(s) → Parquet (id, vec)."""
    read_vecs(spark, src, kind).write.mode("overwrite").parquet(dst)
