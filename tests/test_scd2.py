"""SCD Type-2 semantics: upserts open versions, any later event closes the
open one, deletes emit nothing, re-upserts after delete reopen."""

from pyspark.sql import functions as F

from rabitq_spark.operators.scd import scd2_history


def test_scd2_lifecycle_semantics(spark):
    initial = spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], "doc_id long, text string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 1, "upsert"),   # doc 1: new version at batch 1
            (2, None, 1, "delete"),   # doc 2: deleted at batch 1
            (2, "b2", 2, "upsert"),   # ... and reopened at batch 2
            (1, None, 3, "delete"),   # doc 1: closed for good at batch 3
        ],
        "doc_id long, text string, batch_id int, op string",
    )
    rows = {
        (r["doc_id"], r["version"]): r
        for r in scd2_history(initial, changes).collect()
    }
    # doc 1: v1 [0,1), v2 [1,3) closed by the delete, nothing current
    assert rows[(1, 1)]["valid_from"] == 0 and rows[(1, 1)]["valid_to"] == 1
    assert rows[(1, 2)]["valid_from"] == 1 and rows[(1, 2)]["valid_to"] == 3
    assert rows[(1, 2)]["is_current"] == 0
    # doc 2: v1 closed by delete at 1, v2 reopened at 2 and still current
    assert rows[(2, 1)]["valid_to"] == 1
    assert rows[(2, 2)]["valid_from"] == 2 and rows[(2, 2)]["valid_to"] is None
    assert rows[(2, 2)]["is_current"] == 1
    # doc 3: untouched, single current version
    assert rows[(3, 1)]["valid_to"] is None and rows[(3, 1)]["is_current"] == 1
    # the delete events themselves emit no rows
    assert len(rows) == 5


def test_scd2_single_shuffle_plan(spark):
    """Both windows share the business-key partitioning — the history
    resolves with ONE exchange on doc_id, no self-joins."""
    initial = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    changes = initial.select(
        "doc_id",
        "text",
        F.lit(1).cast("int").alias("batch_id"),
        F.lit("upsert").alias("op"),
    )
    plan = (
        scd2_history(initial, changes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning(doc_id") <= 2  # union sides
