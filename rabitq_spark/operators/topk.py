"""Per-group top-k — the engine's A1/A5 partial-sort primitive.

Reference uses select_nth_unstable partial sorts (src/rabitq.rs:284-297,
src/rerank.rs:170-176). In Spark the idiomatic equivalent is a ranked window
with a row_number limit: Spark >= 3.5 rewrites this to WindowGroupLimit, which
keeps only k rows per group inside each shuffle partition before the final
sort — the distributed analogue of a partial sort, no full-sort at any stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k first rows per group under `order_by`, with a 1-based rank.

    Always pass a deterministic total order (break ties on a unique id) so
    results are reproducible across partitionings.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
