"""Z-order layout (operators/zorder.py): Morton interleave correctness vs a
scalar reference, determinism under repartitioning, and the locality
property the layout exists for — range-partitioned z-files cover small
hyper-rectangles of the value space on BOTH columns simultaneously."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rabitq_spark.operators.zorder import zorder_code, zorder_layout


def _morton2(bx: int, by: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((bx >> b) & 1) << (2 * b)
        z |= ((by >> b) & 1) << (2 * b + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(i, i % 37, float((i * 7) % 53)) for i in range(1000)]
    return spark.createDataFrame(rows, "id bigint, x bigint, y double")


def test_morton_interleave_matches_reference(spark, grid):
    out = zorder_code(grid, ["x", "y"], bits=8).toPandas()
    for _, r in out.iterrows():
        assert r["zvalue"] == _morton2(int(r["__bucket_x"]), int(r["__bucket_y"]))


def test_buckets_monotone_and_balanced(spark, grid):
    out = zorder_code(grid, ["x", "y"], bits=8).toPandas()
    g = out.sort_values("x")
    assert g["__bucket_x"].is_monotonic_increasing
    # 37 distinct values over 256 buckets: every tie-class lands in one bucket
    assert out.groupby("x")["__bucket_x"].nunique().max() == 1


def test_codes_partitioning_independent(spark, grid):
    a = zorder_code(grid, ["x", "y"], bits=8).select("id", "zvalue").toPandas()
    b = (
        zorder_code(grid.repartition(13), ["x", "y"], bits=8)
        .select("id", "zvalue")
        .toPandas()
    )
    m = a.merge(b, on="id")
    assert (m["zvalue_x"] == m["zvalue_y"]).all()


def test_rejects_overflowing_code(spark, grid):
    with pytest.raises(ValueError):
        zorder_code(grid, ["x", "y"], bits=32)


def test_layout_locality_beats_hash_layout(spark):
    # uniform 2-d data; compare the mean per-partition bucket-span PRODUCT
    # (the pruning surface a file exposes) between z-order and hash layouts
    rng = np.random.default_rng(5)
    rows = [
        (int(i), int(rng.integers(0, 10_000)), float(rng.integers(0, 10_000)))
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y double")
    coded = zorder_code(df, ["x", "y"], bits=8)

    def mean_span_product(laid_out) -> float:
        spans = (
            laid_out.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("__bucket_x") - F.min("__bucket_x")).alias("sx"),
                (F.max("__bucket_y") - F.min("__bucket_y")).alias("sy"),
            )
            .toPandas()
        )
        return float(((spans["sx"] + 1) * (spans["sy"] + 1)).mean())

    z = coded.repartitionByRange(16, "zvalue")
    h = coded.repartition(16, "id")
    z_area, h_area = mean_span_product(z), mean_span_product(h)
    # hash files cover ~the whole 256x256 square; z files a small fraction
    assert z_area < h_area / 4, (z_area, h_area)


def test_zorder_layout_drops_debug_columns(spark, grid):
    out = zorder_layout(grid, ["x", "y"], bits=8, n_files=4)
    assert set(out.columns) == {"id", "x", "y", "zvalue"}


def test_bucket_stage_has_no_corpus_scale_global_window(spark, sf_dir):
    """Round-4 verdict: the per-column cumulative histogram ran as ONE
    global Window.orderBy task — corpus-sized for distinct-heavy columns.
    Now every window ordered by the distinct value (__v) must carry a
    partition spec (__pid range partitions); the only unpartitioned window
    allowed is the per-partition-totals offset scan (n_parts rows)."""
    from rabitq_spark.operators.zorder import zorder_code

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = zorder_code(df, ["user_id", "value"], bits=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # an unpartitioned window puts the ORDER key first inside
    # windowspecdefinition(...); over __v that is the corpus-scale shape
    assert "windowspecdefinition(__v" not in plan
    # the partitioned form must be present (local prefix scan per __pid)
    assert "windowspecdefinition(__pid" in plan
