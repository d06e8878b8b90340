"""Change-data-capture maintenance: MERGE INTO semantics as a pure
DataFrame transform.

A corpus that feeds a training pipeline is not static — crawls re-fetch
pages, moderation removes documents, metadata gets patched. Lakehouse
engines spell this MERGE INTO (Delta/Iceberg); the engine-level semantics
are expressible as ONE full-outer join on the key:

    matched  + delete condition  -> row dropped
    matched                      -> source row wins (SCD-1 upsert)
    source-only                  -> insert (unless it is a delete)
    target-only                  -> keep

Scale shape: a single shuffle on the merge key (or zero with bucketed
tables, sources/tables.py::write_bucketed); no driver materialization; the
output is a plain DataFrame ready to overwrite-partition or feed downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    delete_condition: Column | str | None = None,
) -> DataFrame:
    """Apply `source` to `target` by `key` with MERGE INTO semantics; the
    output schema is exactly `target`'s.

    `source` must contain every target column; extra source columns (op
    tags, sequence numbers) are visible to `delete_condition` but excluded
    from the output. A source row whose `delete_condition` holds removes the
    matched target row (and inserts nothing if unmatched). Keys must be
    unique per side — the standard MERGE precondition (lakehouse MERGE
    errors on duplicate source matches); violations here yield one output
    row per join match instead.
    """
    if isinstance(delete_condition, str):
        delete_condition = F.expr(delete_condition)
    missing = set(target.columns) - set(source.columns)
    if missing:
        raise ValueError(f"MERGE source lacks target columns: {sorted(missing)}")
    out_cols = list(target.columns)
    t = target.select(
        F.col(key).alias("__k"),
        F.struct(*[F.col(c) for c in out_cols]).alias("__t"),
    )
    s = source.select(
        F.col(key).alias("__k"),
        F.struct(*[F.col(c) for c in out_cols]).alias("__s"),
        (delete_condition if delete_condition is not None else F.lit(False)).alias(
            "__del"
        ),
    )
    joined = t.join(s, "__k", "full_outer")
    # source wins unless it is a delete; absent source keeps the target row;
    # a delete with no match contributes nothing
    winner = (
        F.when(
            F.col("__s").isNotNull() & ~F.coalesce("__del", F.lit(False)),
            F.col("__s"),
        )
        .when(F.col("__s").isNull(), F.col("__t"))
    )
    return (
        joined.select(winner.alias("__w"))
        .filter(F.col("__w").isNotNull())
        .select("__w.*")
    )


def apply_changelog(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply an op-tagged changelog ('upsert' | 'delete' rows) to a snapshot.

    With `seq_col`, multiple changes per key first collapse to the LATEST by
    sequence (one window top-1 — standard CDC compaction), so replaying an
    out-of-order stream converges to the same snapshot.
    """
    latest = changes
    if seq_col is not None:
        from rabitq_spark.operators.topk import topk_per_group

        latest = topk_per_group(
            changes, [key], [F.col(seq_col).desc(), F.col(op_col).asc()], 1
        ).drop("rank")
    return merge_into(
        target, latest, key, delete_condition=F.col(op_col) == "delete"
    )
