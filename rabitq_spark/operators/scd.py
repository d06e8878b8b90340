"""Slowly-Changing-Dimension Type 2 history: turn an initial snapshot plus
ordered change batches (upsert/delete) into versioned validity ranges — the
lakehouse dimension-history shape (Delta/Iceberg MERGE pipelines keep
exactly this table beside the current view).

Plan shape: one union, ONE keyed shuffle (window partitioned by the
business key, ordered by batch), no self-joins — valid_to is the lead()
of the next event's batch, so each key's history resolves in a single
window pass regardless of how many batches touched it. At 100 TB the
partition key is the business id: perfectly parallel, no skew beyond the
hottest key's event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    initial: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    batch_col: str = "batch_id",
    op_col: str = "op",
) -> DataFrame:
    """Build the Type-2 history table.

    `initial` — the batch-0 snapshot (payload columns only); `changes` —
    (id, payload..., batch_col >= 1, op_col in {'upsert', 'delete'}).
    Semantics: every upsert OPENS a version valid from its batch; any later
    event on the same key (upsert or delete) CLOSES the open version at its
    batch; a delete emits no row of its own. Output: one row per upsert —
    (id, payload..., version, valid_from, valid_to, is_current) with
    valid_to NULL while the version is still open.
    """
    payload = [c for c in initial.columns if c != id_col]
    ev0 = initial.select(
        id_col,
        *payload,
        F.lit(0).cast("int").alias(batch_col),
        F.lit("upsert").alias(op_col),
    )
    events = ev0.unionByName(
        changes.select(id_col, *payload, batch_col, op_col)
    )
    w = Window.partitionBy(id_col).orderBy(batch_col)
    closed = events.withColumn(
        "valid_to", F.lead(F.col(batch_col)).over(w).cast("int")
    )
    upserts = closed.filter(F.col(op_col) == "upsert")
    wv = Window.partitionBy(id_col).orderBy(batch_col)
    return upserts.select(
        id_col,
        *payload,
        F.row_number().over(wv).cast("int").alias("version"),
        F.col(batch_col).cast("int").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().cast("int").alias("is_current"),
    )


def scd2_as_of(history: DataFrame, batch: int) -> DataFrame:
    """Time-travel read over a Type-2 history: the rows valid AT `batch` —
    valid_from <= batch < valid_to (open versions have NULL valid_to).
    A pure filter: at scale it rides partition/row-group pruning if the
    history is written partitioned or z-ordered by validity range."""
    return history.filter(
        (F.col("valid_from") <= F.lit(int(batch)))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(int(batch))))
    )
