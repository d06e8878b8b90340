"""RaBitQ index model: the Spark-shaped equivalent of the reference's
`RaBitQ` struct (src/rabitq.rs:58-69).

Big state lives in DataFrames (index codes+factors, base vectors); small
state (rotation matrix, dither bias, projected centroids) is driver-held
numpy, broadcast to executors — mirroring SURVEY.md §1.1's mapping.

Persistence (S6/S7 analogue, src/rabitq.rs:84-156): a directory of
  index/   Parquet, partitioned by cluster_id   (codes + factors + orig_id)
  base/    Parquet                              (orig_id, vec  — unrotated, padded)
  meta.json + arrays.npz                        (dim, config, P, bias, centroids)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from rabitq_spark.config import RaBitQConfig


@dataclass
class RaBitQModel:
    config: RaBitQConfig
    dim: int          # original dimension
    dim_pad: int      # padded to multiple of 64 (src/rabitq.rs:167-179)
    rotation: "np.ndarray | object"  # dense (dim_pad, dim_pad) orthogonal P, or BlockRotation past the dense ceiling
    rand_bias: np.ndarray       # (dim_pad,) U(0,1) dither
    centroids_proj: np.ndarray  # (k, dim_pad) — projected centroids C·P
    index_df: DataFrame  # cluster_id, orig_id, code[], factor_ip, factor_ppc, error_bound, center_dist_sq
    base_df: DataFrame   # orig_id, vec (original values, padded to dim_pad)
    n_rows: int | None = None  # indexed row count when the builder knows it
    # (never computed with an extra job); lets search() size the rerank
    # width from the exact average cluster size instead of the sqrt(n)
    # approximation
    vec_store: "object | None" = None  # optional VecStore (index/vecstore.py):
    # fixed-width raw sidecar for candidate-bound exact rerank — the disk
    # variant's point-read design (crates/disk/src/cache.rs:115-145). When
    # set, search() stage 7 gathers ONLY candidate rows instead of joining
    # (and thus fully scanning) base_df.

    @property
    def n_clusters(self) -> int:
        return self.centroids_proj.shape[0]

    @property
    def n_words(self) -> int:
        return self.dim_pad // 64

    # -- persistence -------------------------------------------------------

    def save(self, path: str, store_min_rows: int | None = None) -> None:
        """Write index + base Parquet and the numpy/JSON sidecar.

        `path` may be a posix directory or a scheme-qualified URI (s3://,
        s3a://, hdfs://, file://): parquet goes through Spark, the vec
        store and the numpy/JSON sidecars through pyarrow.fs, so a cluster
        can persist a model directly onto the object store its searchers
        load from (load() takes the same URI).

        The index is partitioned by cluster_id so a probe-filtered read
        prunes partitions (the Spark analogue of the reference's CSR posting
        ranges, src/rabitq.rs:240-252 — offsets become partition boundaries).

        A vec-store sidecar (index/vecstore.py — candidate-bound point-read
        rerank) is written when the model already carries one, OR when the
        indexed row count is at/above `store_min_rows` (default
        vecstore.STORE_AUTO_MIN_ROWS): at that scale the O(base) rerank
        join is the measured scale killer, so the scale-safe plan must be
        what a plain save → load → search gets BY DEFAULT, not behind an
        attach_vec_store call the user has to know about. load()
        auto-attaches any sidecar it finds and search() dispatches on it.
        """
        from rabitq_spark.index.vecstore import (
            STORE_AUTO_MIN_ROWS,
            _fs_path,
            _is_uri,
        )

        if store_min_rows is None:
            store_min_rows = STORE_AUTO_MIN_ROWS
        # URI targets (s3://, s3a://, hdfs://, file://, any pyarrow.fs
        # scheme): the index/base parquet and the vec-store sidecar already
        # write through URI-capable layers (Spark, pyarrow.fs); the numpy/
        # JSON sidecars go through pyarrow.fs streams below. The one
        # requirement is a scheme BOTH Spark's Hadoop layer and pyarrow
        # resolve (s3a:// is bridged to pyarrow's s3:// in _fs_path).
        is_uri = _is_uri(path)
        if is_uri:
            fs, root = _fs_path(path)
            fs.create_dir(root, recursive=True)
        else:
            os.makedirs(path, exist_ok=True)
        (
            self.index_df.repartition("cluster_id")
            .sortWithinPartitions("center_dist_sq")
            .write.mode("overwrite")
            .partitionBy("cluster_id")
            .parquet(f"{path}/index")
        )
        self.base_df.write.mode("overwrite").parquet(f"{path}/base")
        if self.n_rows is not None:
            big = self.n_rows >= store_min_rows
        else:
            # bounded probe (the round-2 dispatch pattern): the decision
            # only needs which SIDE of the threshold the base is on, so
            # read at most store_min_rows rows — never a full-scan count.
            # Reads the just-written parquet, not the (possibly expensive)
            # base_df lineage.
            big = (
                self.base_df.sparkSession.read.parquet(f"{path}/base")
                .limit(store_min_rows)
                .count()
                >= store_min_rows
            )
        if self.vec_store is not None or big:
            # re-materialize the point-read sidecar under the save dir (same
            # values — the store is a pure function of base_df, like index/).
            # Build it from the JUST-WRITTEN base parquet, not self.base_df:
            # the lineage behind base_df may be expensive (it already ran
            # once to write {path}/base) and the parquet holds identical
            # rows by construction.
            from rabitq_spark.index.vecstore import build_vec_store

            build_vec_store(
                self.base_df.sparkSession.read.parquet(f"{path}/base"),
                f"{path}/vecstore", dim=self.dim, n_rows=self.n_rows,
            )
        elif is_uri:
            # overwrite-save of a store-less model must REMOVE a stale
            # sidecar left by a previous occupant of this path: load()
            # auto-attaches any vecstore dir it finds, and index/ + base/
            # were just overwritten — a surviving old store would serve the
            # previous model's vectors to the new model's shortlists
            from rabitq_spark.index.vecstore import VecStore

            if VecStore.exists(f"{path}/vecstore"):
                sfs, sroot = _fs_path(f"{path}/vecstore")
                sfs.delete_dir(sroot)
        elif os.path.isdir(f"{path}/vecstore"):
            # same stale-sidecar removal, posix form
            import shutil

            shutil.rmtree(f"{path}/vecstore")
        from rabitq_spark.index.rotation import BlockRotation

        if isinstance(self.rotation, BlockRotation):
            # block-diagonal rotation (dim > dense ceiling): one array per block
            rot_arrays = {
                f"rotation_block_{i}": b for i, b in enumerate(self.rotation.blocks)
            }
        else:
            rot_arrays = {"rotation": self.rotation}
        meta = {
            "dim": self.dim,
            "dim_pad": self.dim_pad,
            "config": self.config.__dict__,
            "n_rows": self.n_rows,
            "format_version": 1,
        }
        if is_uri:
            import io

            buf = io.BytesIO()
            np.savez(
                buf,
                rand_bias=self.rand_bias,
                centroids_proj=self.centroids_proj,
                **rot_arrays,
            )
            with fs.open_output_stream(f"{root}/arrays.npz") as f:
                f.write(buf.getvalue())
            with fs.open_output_stream(f"{root}/meta.json") as f:
                f.write(json.dumps(meta).encode())
        else:
            np.savez(
                f"{path}/arrays.npz",
                rand_bias=self.rand_bias,
                centroids_proj=self.centroids_proj,
                **rot_arrays,
            )
            with open(f"{path}/meta.json", "w") as f:
                json.dump(meta, f)

    def persist_bucketed(
        self, n_buckets: int = 32, name: str = "rabitq_model"
    ) -> RaBitQModel:
        """Re-persist the big state as BUCKETED tables: index by cluster_id
        (the J2 probes⋈index key), base by orig_id (the J3 rerank key).

        A bucketed scan carries its HashPartitioning into the plan, so the
        rerank join shuffles ONLY the (small) shortlist side into the bucket
        layout — the base table, the 100 TB side, never moves again across
        repeated query batches. Same for a shuffle-mode probe join against
        the index. Returns a model whose DataFrames read from the bucketed
        tables; the numpy sidecar state is shared, not copied.
        """
        from rabitq_spark.sources.tables import write_bucketed

        index = write_bucketed(
            self.index_df, f"{name}_index", "cluster_id", n_buckets
        )
        base = write_bucketed(
            self.base_df, f"{name}_base", "orig_id", n_buckets, sort_col="orig_id"
        )
        return RaBitQModel(
            config=self.config,
            dim=self.dim,
            dim_pad=self.dim_pad,
            rotation=self.rotation,
            rand_bias=self.rand_bias,
            centroids_proj=self.centroids_proj,
            index_df=index,
            base_df=base,
            n_rows=self.n_rows,
            vec_store=self.vec_store,
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> RaBitQModel:
        from rabitq_spark.index.rotation import BlockRotation

        from rabitq_spark.index.vecstore import VecStore, _fs_path, _is_uri

        if _is_uri(path):
            # URI model dir (object/cluster storage): numpy/JSON sidecars
            # read through pyarrow.fs; parquet + vecstore are URI-capable
            # already. np.load needs a seekable file — buffer the (small,
            # rotation-matrix-sized) archive.
            import io

            fs, root = _fs_path(path)
            with fs.open_input_file(f"{root}/meta.json") as f:
                meta = json.load(f)
            with fs.open_input_file(f"{root}/arrays.npz") as f:
                arrays = np.load(io.BytesIO(f.read()))
        else:
            with open(f"{path}/meta.json") as f:
                meta = json.load(f)
            arrays = np.load(f"{path}/arrays.npz")
        if "rotation" in arrays:
            rotation = arrays["rotation"]
        else:
            n_blocks = sum(1 for k in arrays.files if k.startswith("rotation_block_"))
            rotation = BlockRotation(
                [arrays[f"rotation_block_{i}"] for i in range(n_blocks)]
            )
        return cls(
            config=RaBitQConfig(**meta["config"]),
            dim=meta["dim"],
            dim_pad=meta["dim_pad"],
            rotation=rotation,
            rand_bias=arrays["rand_bias"],
            centroids_proj=arrays["centroids_proj"],
            index_df=spark.read.parquet(f"{path}/index"),
            base_df=spark.read.parquet(f"{path}/base"),
            n_rows=meta.get("n_rows"),
            vec_store=(
                VecStore.open(f"{path}/vecstore")
                if VecStore.exists(f"{path}/vecstore")
                else None
            ),
        )
