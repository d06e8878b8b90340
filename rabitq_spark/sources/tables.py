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


def events_with_micros(df: DataFrame) -> DataFrame:
    """Normalize an events frame to (ts_us BIGINT epoch-micros, ts TIMESTAMP).

    Handles every layout the driver has shipped: TIMESTAMP(NANOS) read as
    raw nanos (legacy conf → BIGINT), TIMESTAMP_NTZ (parquet timestamp[us]
    without tz, the current testdata), and UTC-adjusted TIMESTAMP. All
    conversions are integer-exact and timezone-free: integer DIV for ns→µs
    (double division loses precision at 2024-era epoch-nanos magnitudes),
    timestampdiff from the epoch for NTZ (a cast would apply the session tz).
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # legacy nanos-as-long read
        df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn(
            "ts_us",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
    else:  # timestamp (UTC-adjusted instant)
        df = df.withColumn("ts_us", F.unix_micros("ts"))
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    The events table's raw ts column has changed type across driver
    generations (TIMESTAMP(NANOS), then timestamp[us]); normalize it to an
    exact epoch-micros BIGINT `ts_us` plus a TIMESTAMP `ts` so every
    downstream operator and oracle sees one layout.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return events_with_micros(df)
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
