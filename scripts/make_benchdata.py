"""Generate the sf1.0 bench dataset (10x sf0.1) under .benchdata/sf1.0.

The driver ships sf{0.001,0.01,0.1} only; the round-3 verdict asks for a
bench point one SF up to surface what sf0.1 hides (shuffle widths, probe
broadcast limits). Construction: 10 key-offset replicas of every sf0.1
table, so the star-schema joins stay consistent replica-by-replica and all
row counts scale exactly 10x. Pyarrow end-to-end so physical Parquet types
survive byte-for-byte (the events table's TIMESTAMP(NANOS) must stay nanos
for sources/tables.py's legacy-read path).

Two tables get per-replica perturbation so the scaled corpus doesn't become
one giant duplicate cluster (which would measure candidate-pair explosion,
not engine throughput):
  documents — replicas drop ~30% of tokens (seeded per doc) and permute the
    rest: kills word-shingle/char-ngram Jaccard AND moves the simhash token
    multiset, so cross-replica near-dup pairs stay rare under all four text
    operators.
  embeddings — replicas get seeded Gaussian noise at 30% of the vector
    norm: far outside every cosine-near-dup threshold in the suite, still
    the same cluster structure for ANN.
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf1.0")
REPLICAS = 10
OFF = 100_000_000  # per-replica key offset, far above any sf0.1 key

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def _offset_keys(t: pa.Table, keys: list[str], r: int) -> pa.Table:
    for k in keys:
        idx = t.schema.get_field_index(k)
        shifted = pc.add(t.column(k), pa.scalar(r * OFF, type=t.schema.field(k).type))
        t = t.set_column(idx, t.schema.field(k), shifted)
    return t


def _replicate(name: str) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = [_offset_keys(t, KEY_COLS[name], r) for r in range(REPLICAS)]
    return pa.concat_tables(parts)


def _perturb_documents() -> pa.Table:
    t = pq.read_table(f"{SRC}/documents.parquet")
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    langs, sources = t.column("lang"), t.column("source")
    out = []
    for r in range(REPLICAS):
        if r == 0:
            new_texts = texts
        else:
            new_texts = []
            for d, s in zip(ids, texts):
                rng = np.random.default_rng(int(d) * REPLICAS + r)
                toks = s.split()
                keep = [tk for tk in toks if rng.random() < 0.7]
                rng.shuffle(keep)
                new_texts.append(f"r{r}d{d} " + " ".join(keep))
        out.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + r * OFF, type=pa.int64()),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": langs,
                    "source": sources,
                    "n_chars": pa.array(
                        [len(s) for s in new_texts], type=pa.int64()
                    ),
                }
            )
        )
    return pa.concat_tables(out)


def _perturb_embeddings() -> pa.Table:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    vecs = np.vstack([np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()])
    labels = t.column("label")
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    out = []
    for r in range(REPLICAS):
        if r == 0:
            v = vecs
        else:
            rng = np.random.default_rng(1000 + r)
            noise = rng.standard_normal(vecs.shape).astype(np.float32)
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            v = vecs + 0.3 * norms * noise
        out.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + r * OFF, type=pa.int64()),
                    "embedding": pa.array(
                        [row for row in v.astype(np.float32)],
                        type=t.schema.field("embedding").type,
                    ),
                    "label": labels,
                }
            )
        )
    return pa.concat_tables(out)


def main() -> None:
    # optional argv: [replicas] [dst_tag] — e.g. `make_benchdata.py 30 sf3.0`
    # builds the 30x point the bench's linear-slope gates compare against
    global REPLICAS, DST
    if len(sys.argv) > 1:
        REPLICAS = int(sys.argv[1])
    if len(sys.argv) > 2:
        DST = os.path.join(os.path.dirname(DST), sys.argv[2])
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    for name in KEY_COLS:
        pq.write_table(_replicate(name), f"{DST}/{name}.parquet")
    pq.write_table(_perturb_documents(), f"{DST}/documents.parquet")
    pq.write_table(_perturb_embeddings(), f"{DST}/embeddings.parquet")
    for name in (*KEY_COLS, "region", "nation", "documents", "embeddings"):
        n = pq.read_metadata(f"{DST}/{name}.parquet").num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
