"""Parquet table sources for the driver's testdata star schema.

Everything is `spark.read.parquet` — columnar scan with column pruning and
predicate pushdown for free. At 100 TB these would be the same calls against
s3a:// paths (Spark reads S3 natively — SURVEY.md S8/S9: no custom IO layer
needed; Parquet row-group pruning replaces the reference's 512 KiB S3 range
reads, crates/disk/src/cache.rs:105-145).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    The events table carries TIMESTAMP(NANOS) which Spark 4 rejects by
    default; read it as raw nanos (legacy conf, session-settable) and expose
    both an exact epoch-micros BIGINT and a TIMESTAMP column. Integer DIV
    keeps the ns→µs conversion exact (a double division would lose precision
    at 2024-era epoch-nanos magnitudes).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return (
            df.withColumn("ts_us", F.expr("ts DIV 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> DataFrame:
    """Persist `df` as a bucketed (and optionally sorted) Parquet table.

    Two tables bucketed by the same column into the same bucket count join
    WITHOUT a shuffle — each task reads matching buckets from both sides
    (the co-located join from the 100 TB brief; at cluster scale this
    removes the dominant exchange from repeated fact-fact joins, e.g.
    re-joining ANN results to the base table across query batches).
    Returns the re-read table handle.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a previous SESSION may have left the managed location behind without a
    # catalog entry (fresh in-memory catalog + surviving warehouse dir);
    # saveAsTable refuses to create over it, so clear the orphan
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    orphan = os.path.join(warehouse, name.lower())
    if os.path.isdir(orphan):
        shutil.rmtree(orphan, ignore_errors=True)
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)
    return spark.table(name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
