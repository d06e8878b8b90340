"""Data-quality constraint auditing — the dbt-test / Deequ-style gate a
100 TB ingest runs before promoting a snapshot: primary-key uniqueness,
foreign-key integrity, null and range rules, each reported as a
(constraint, violations) row. Everything is a single keyed aggregate or an
anti-join — no driver-side iteration, every check is one scan of the
audited table (the FK check broadcasts or shuffles on the key exactly like
any equi-join).

The reference has no relational surface; this belongs to the engine's
north-star pipeline extensions (training-data manifests are only
trustworthy behind such a gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows participating in duplicate key groups (count > 1 per key):
    the number of rows that would collide on the primary key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("violations"))
    )


def fk_violations(
    child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str
) -> DataFrame:
    """Child rows whose non-null foreign key has no parent (anti join —
    broadcast when the parent is a dim table)."""
    parents = parent.select(F.col(pk_col).alias("__pk")).distinct()
    return (
        child.filter(F.col(fk_col).isNotNull())
        .join(parents, F.col(fk_col) == F.col("__pk"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )


def null_violations(df: DataFrame, col: str) -> DataFrame:
    return df.agg(
        F.coalesce(F.sum(F.col(col).isNull().cast("bigint")), F.lit(0)).alias(
            "violations"
        )
    )


def predicate_violations(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows FAILING the predicate (nulls count as failures — a range rule
    a null silently passes is a broken rule)."""
    return df.agg(
        F.coalesce(
            F.sum((~F.coalesce(predicate, F.lit(False))).cast("bigint")), F.lit(0)
        ).alias("violations")
    )


def constraint_report(named_checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union the single-row check outputs into one (constraint, violations)
    report, tagged in declaration order. Each check stays an independent
    one-scan aggregate; the union is plan-level only."""
    tagged = [
        df.select(F.lit(name).alias("constraint"), F.col("violations"))
        for name, df in named_checks
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out
