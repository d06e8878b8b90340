"""MERGE INTO / changelog-apply semantics (operators/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.cdc import apply_changelog, merge_into


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "id bigint, val string, n int",
    )


def _rows(df):
    return sorted(map(tuple, df.toPandas().values.tolist()))


def test_merge_upsert_insert_delete_keep(spark, target):
    source = spark.createDataFrame(
        [
            (2, "B", 21, "upsert"),   # matched update
            (3, "c", 30, "delete"),   # matched delete
            (5, "e", 50, "upsert"),   # insert
            (6, "x", 60, "delete"),   # unmatched delete: no-op
        ],
        "id bigint, val string, n int, op string",
    )
    out = merge_into(target, source, "id", delete_condition=F.col("op") == "delete")
    assert _rows(out) == [(1, "a", 10), (2, "B", 21), (4, "d", 40), (5, "e", 50)]
    assert out.columns == target.columns  # op never leaks into the output


def test_merge_without_delete_condition_is_pure_upsert(spark, target):
    source = spark.createDataFrame(
        [(1, "A", 11), (9, "i", 90)], "id bigint, val string, n int"
    )
    out = merge_into(target, source, "id")
    assert _rows(out) == [
        (1, "A", 11), (2, "b", 20), (3, "c", 30), (4, "d", 40), (9, "i", 90)
    ]


def test_merge_rejects_missing_columns(spark, target):
    source = spark.createDataFrame([(1, "A")], "id bigint, val string")
    with pytest.raises(ValueError):
        merge_into(target, source, "id")


def test_apply_changelog_compacts_by_sequence(spark, target):
    changes = spark.createDataFrame(
        [
            (2, "B1", 21, "upsert", 1),
            (2, "B2", 22, "upsert", 3),   # latest wins
            (2, "Bx", 0, "delete", 2),    # superseded by seq 3
            (4, "dx", 0, "delete", 9),    # delete wins for id 4
            (7, "g", 70, "upsert", 1),
        ],
        "id bigint, val string, n int, op string, seq int",
    )
    out = apply_changelog(target, changes, "id", seq_col="seq")
    assert _rows(out) == [(1, "a", 10), (2, "B2", 22), (3, "c", 30), (7, "g", 70)]


def test_apply_changelog_without_seq(spark, target):
    changes = spark.createDataFrame(
        [(1, "", 0, "delete"), (8, "h", 80, "upsert")],
        "id bigint, val string, n int, op string",
    )
    out = apply_changelog(target, changes, "id")
    assert _rows(out) == [(2, "b", 20), (3, "c", 30), (4, "d", 40), (8, "h", 80)]
