"""Engine configuration.

Mirrors the reference's compile-time constants (src/consts.rs:4-12) as a
runtime dataclass, plus the Spark-batch knobs that replace its sequential
heap pruning (SURVEY.md §4: over-fetch factor instead of dynamic threshold).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RaBitQConfig:
    """Knobs for IVF + RaBitQ index build and batch search.

    Attributes:
        epsilon: error-bound multiplier (reference EPSILON, src/consts.rs:6).
        theta_log_dim: query quantization bits (THETA_LOG_DIM=4, src/consts.rs:8).
        default_x_dot_product: 0-guard for the normalized residual dot
            (DEFAULT_X_DOT_PRODUCT, src/consts.rs:4).
        n_clusters: IVF coarse cluster count (k for KMeans).
        nprobe: clusters probed per query (CLI default 100, crates/cli/src/main.rs:27).
        topk: neighbors returned per query (CLI default 10).
        overfetch: rough-candidate multiplier R = overfetch * topk kept per
            query before exact rerank — the batch substitute for the
            reference's sequential monotonic threshold (src/rerank.rs:83-99).
        seed: RNG seed for rotation matrix / dither bias / KMeans.
        bits_per_dim: bits per dimension for the BASE codes. 1 (default) is
            the reference's sign-bit RaBitQ code (src/utils.rs:53-61); >= 2
            scalar-quantizes each base residual to B bit-planes (the
            extended-RaBitQ accuracy knob — the reference README's unchecked
            "fastscan"-era follow-up): a sharper estimator at B× the code
            bytes, so fewer rerank slots are needed for the same recall.
    """

    epsilon: float = 1.9
    theta_log_dim: int = 4
    default_x_dot_product: float = 0.8
    n_clusters: int = 16
    bits_per_dim: int = 1
    # Recall-leaning defaults, like the reference CLI (nprobe default 100,
    # crates/cli/src/main.rs:27): measured ≥0.94 recall@10 on the sf0.01
    # fixture (nprobe=8/overfetch=8 measured 0.84 — too lossy for a default).
    nprobe: int = 12
    topk: int = 10
    overfetch: int = 16
    seed: int = 42

    @property
    def scalar(self) -> float:
        """Quantization scalar = 1/(2^theta_log_dim - 1) (src/consts.rs:10)."""
        return 1.0 / ((1 << self.theta_log_dim) - 1)
