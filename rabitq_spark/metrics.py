"""Search metrics — the engine's analogue of the reference's global atomic
counters (src/metrics.rs:7-61; SURVEY.md A10).

Spark-native mechanism: `df.observe(Observation, ...)` attaches accumulator-
backed aggregates to a point in the plan; values materialize after the first
action, with zero extra passes over the data. Where the reference counts
rough-scored candidates vs precisely reranked candidates (src/rerank.rs:
104-105), we observe the candidate stream before and after the top-R
shortlist.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Observation


@dataclass
class SearchMetrics:
    """Holds Observations wired into a search plan by
    `rabitq_spark.index.search.search(..., metrics=...)`."""

    rough: Observation = field(default_factory=lambda: Observation("rabitq_rough"))
    precise: Observation = field(default_factory=lambda: Observation("rabitq_precise"))
    rerank: Observation = field(default_factory=lambda: Observation("rabitq_rerank"))
    # The rough/precise counters wrap the candidate stream and the top-R
    # shortlist in CollectMetrics nodes. At scale those nodes are ruinous
    # — bisected at 10M × 256 / 146M candidates (round 9): the rough
    # observer splits the whole-stage-codegen span over the full candidate
    # stream (+77 s), and the precise observer above the top-R filter
    # defeats the WindowGroupLimit pre-shuffle trim (+135 s on a 19 s
    # search). Large-scale callers disable both and derive the counts
    # analytically (rough = probe table ⋈ cluster sizes; precise ≈ nq × R)
    # — the rerank observer sits on streams bounded by nq × R rows with no
    # window/codegen interaction and measured free, so it has no flag.
    observe_rough: bool = True
    observe_precise: bool = True

    @property
    def rough_count(self) -> int:
        """Candidates scored by the quantized estimator (METRICS.rough)."""
        return int(self.rough.get["rough_count"])

    @property
    def precise_count(self) -> int:
        """Candidates exactly reranked (METRICS.precise)."""
        return int(self.precise.get["precise_count"])

    @property
    def rerank_base_rows(self) -> int:
        """Rows the exact rerank read from base storage: the full base row
        count under the join plan, the candidate count under the vec-store
        point-read plan — the measurable form of 'candidate-bound rerank'
        (round-8 verdict item 5)."""
        return int(self.rerank.get["rerank_base_rows"])

    @property
    def ratio(self) -> float:
        """precise/rough — estimator selectivity (src/metrics.rs:30-41)."""
        r = self.rough_count
        return (self.precise_count / r) if r else 0.0
