"""Constraint audit operators: each check counts exactly the violating
rows, including null handling."""

from pyspark.sql import functions as F

from rabitq_spark.operators.audit import (
    constraint_report,
    fk_violations,
    null_violations,
    pk_violations,
    predicate_violations,
)


def test_pk_violations_counts_colliding_rows(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "k long")
    assert pk_violations(df, ["k"]).first()["violations"] == 3
    clean = spark.createDataFrame([(1,), (2,)], "k long")
    assert pk_violations(clean, ["k"]).first()["violations"] == 0


def test_fk_violations_ignores_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (None,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    assert fk_violations(child, "fk", parent, "pk").first()["violations"] == 1


def test_predicate_violations_null_fails(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,), (99.0,)], "x double")
    got = predicate_violations(df, F.col("x") <= 2.0).first()["violations"]
    assert got == 2  # 99.0 and the NULL both fail


def test_constraint_report_orders_and_names(spark):
    df = spark.createDataFrame([(1,), (None,)], "x long")
    rep = constraint_report(
        [
            ("a", null_violations(df, "x")),
            ("b", predicate_violations(df, F.col("x") > 0)),
        ]
    ).collect()
    assert [(r["constraint"], r["violations"]) for r in rep] == [("a", 1), ("b", 1)]
