"""Parquet table sources for the driver's testdata star schema.

Everything is `spark.read.parquet` — columnar scan with column pruning and
predicate pushdown for free. At 100 TB these would be the same calls against
s3a:// paths (Spark reads S3 natively — SURVEY.md S8/S9: no custom IO layer
needed; Parquet row-group pruning replaces the reference's 512 KiB S3 range
reads, crates/disk/src/cache.rs:105-145).
"""

from __future__ import annotations

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
    """Load one testdata table (TESTDATA.md layout)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
