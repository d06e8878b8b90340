"""Orthogonal rotation representations.

The reference materializes one dense (dim, dim) QR rotation
(gen_random_qr_orthogonal, src/utils.rs:16-20). Dense is fine to ~2k dims;
past that the driver-held/broadcast matrix grows quadratically (a dim-8192
float32 matrix is 256 MB — round-1 PLAN ceiling). BlockRotation keeps a
block-diagonal orthogonal matrix instead: storage and apply cost are
O(dim × block_dim), the matrix stays orthogonal (each block is), and every
downstream identity the engine relies on (norm preservation, exhaustive ==
brute force) is unchanged. Block-diagonal mixes only within blocks — the
standard large-dim compromise (cf. FAISS OPQ block rotations); recall, not
correctness, is the only thing affected, and only via estimator quality.
"""

from __future__ import annotations

import numpy as np


class BlockRotation:
    """Block-diagonal orthogonal matrix, stored as its diagonal blocks."""

    def __init__(self, blocks: list[np.ndarray]):
        self.blocks = [np.ascontiguousarray(b, dtype=np.float32) for b in blocks]
        sizes = [b.shape[0] for b in self.blocks]
        for b in self.blocks:
            if b.shape[0] != b.shape[1]:
                raise ValueError("rotation blocks must be square")
        self.offsets = np.concatenate(([0], np.cumsum(sizes)))

    @property
    def dim(self) -> int:
        return int(self.offsets[-1])

    def _apply(self, x: np.ndarray, transpose: bool) -> np.ndarray:
        x = np.asarray(x)
        out = np.empty((x.shape[0], self.dim), dtype=np.float32)
        for blk, s, e in zip(self.blocks, self.offsets[:-1], self.offsets[1:]):
            m = blk.T if transpose else blk
            out[:, s:e] = x[:, s:e].astype(np.float32) @ m
        return out

    def apply(self, x: np.ndarray) -> np.ndarray:
        return self._apply(x, transpose=False)

    def apply_T(self, x: np.ndarray) -> np.ndarray:
        return self._apply(x, transpose=True)


def apply_rot(x: np.ndarray, rot) -> np.ndarray:
    """x @ R for dense or block rotations."""
    if isinstance(rot, np.ndarray):
        return x @ rot
    return rot.apply(x)


def apply_rot_T(x: np.ndarray, rot) -> np.ndarray:
    """x @ Rᵀ (inverse rotation — R is orthogonal) for dense or block."""
    if isinstance(rot, np.ndarray):
        return x @ rot.T
    return rot.apply_T(x)
