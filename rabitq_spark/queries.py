"""Query registry: every implemented operator exposed as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-equivalent oracle SQL string.

Driver contract (see __spark_entry__.py): per-query row-count + schema +
order-insensitive value-hash comparison at sf0.01. Column names are aliased
identically on both sides; float results are computed with deterministic
double-precision folds (bit-identical to DuckDB's list_reduce — verified) or
exact DECIMAL arithmetic cast back to double, so hashes match exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabitq_spark.operators.knn import knn_exact
from rabitq_spark.operators.topk import topk_per_group
from rabitq_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# helpers


def _dec_sum(col, scale: int = 4):
    """Order-independent exact sum: DECIMAL arithmetic, emitted as DOUBLE.

    Double addition is non-associative, and Spark's partial aggregation order
    differs from a single-threaded oracle; summing in DECIMAL(38, scale) makes
    the result independent of partitioning, then the final cast to DOUBLE is
    exact and deterministic.
    """
    return F.sum(F.col(col).cast(f"decimal(38,{scale})")).cast("double")


# --------------------------------------------------------------------------
# Q: exact brute-force k-NN (SURVEY §2: J1 + D1 + A1; §7 phase 1)

_KNN_K = 10
_KNN_NQ = 10


def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    return knn_exact(queries, base, _KNN_K)


_SQL_KNN_EXACT = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {_KNN_NQ}
), scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_reduce(
           list_transform(range(1, len(b.embedding)+1),
             i -> (CAST(q.qvec[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
                  * (CAST(q.qvec[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))),
           (acc, x) -> acc + x) AS dist
  FROM embeddings b, q
)
SELECT query_id, neighbor_id, dist, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM scored
) t WHERE rank <= {_KNN_K}
"""


# --------------------------------------------------------------------------
# Q: per-group top-k (A1/A5 window partial sort) on relational data

def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    ranked = topk_per_group(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return ranked.select("c_mktsegment", "o_orderkey", "o_totalprice", "rank")


_SQL_TOPK_ORDERS = """
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) t WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# Q: pricing summary (TPC-H Q1 shape: scan + filter + groupBy agg, map-side
# partial aggregation; exercises predicate pushdown on l_shipdate)

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").alias("sum_qty"),
            _dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q: IVF + RaBitQ index build + batch search (SURVEY §3, §7 phases 2-3).
#
# The exhaustive configuration (nprobe = n_clusters, unbounded overfetch)
# reranks every candidate exactly, so the result equals brute-force k-NN
# bit-for-bit — making the full train+search pipeline DuckDB-oracle-checkable
# (the estimator/quantization path is still exercised: codes, factors, rough
# scores and the top-R shortlist all run; the shortlist just keeps everything).

_MODEL_CACHE: dict = {}


def _get_model(spark: SparkSession, sf_dir: str):
    from rabitq_spark.config import RaBitQConfig
    from rabitq_spark.index import build_index

    key = sf_dir
    if key not in _MODEL_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        model = build_index(base, RaBitQConfig())
        model.index_df = model.index_df.cache()
        _MODEL_CACHE[key] = model
    return _MODEL_CACHE[key]


def q_ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rabitq_spark.index import search

    model = _get_model(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return search(
        model, queries, topk=_KNN_K, nprobe=model.n_clusters, overfetch=10**6
    )


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate search at default nprobe/overfetch, reported as per-query
    recall@k vs the exact oracle (A8, src/utils.rs:367-379). Not
    SQL-expressible (depends on trained KMeans state) -> rows-only check."""
    from rabitq_spark.index import search

    model = _get_model(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    approx = search(model, queries, topk=_KNN_K)
    exact = knn_exact(queries, base, _KNN_K)
    hits = approx.join(
        exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    return (
        hits.groupBy("query_id")
        .agg((F.count(F.lit(1)) / _KNN_K).alias("recall"))
        .agg(F.avg("recall").alias("mean_recall"), F.count(F.lit(1)).alias("n_queries"))
    )


# --------------------------------------------------------------------------
# registry

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "knn_exact": q_knn_exact,
    "ann_ivf_exhaustive": q_ann_ivf_exhaustive,
    "ann_ivf_recall": q_ann_ivf_recall,
    "topk_orders_per_segment": q_topk_orders_per_segment,
    "pricing_summary": q_pricing_summary,
}

ORACLE_SQL: dict[str, str] = {
    "knn_exact": _SQL_KNN_EXACT,
    # exhaustive IVF+RaBitQ == exact brute force (see q_ann_ivf_exhaustive)
    "ann_ivf_exhaustive": _SQL_KNN_EXACT,
    # ann_ivf_recall: intentionally no oracle (depends on trained model state)
    "topk_orders_per_segment": _SQL_TOPK_ORDERS,
    "pricing_summary": _SQL_PRICING,
}
