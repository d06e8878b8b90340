"""Phase-1 smoke: knn_exact vs DuckDB oracle at sf0.01, exact value compare."""

import duckdb
import pandas as pd

from rabitq_spark.operators.knn import knn_exact, knn_exact_fast
from rabitq_spark.session import get_spark

SF = "/root/testdata/sf0.01"
K = 10
NQ = 10

spark = get_spark("smoke_phase1")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
queries = emb.filter(f"vec_id < {NQ}").select(
    emb.vec_id.alias("query_id"), emb.embedding.alias("qvec")
)
base = emb.select(emb.vec_id.alias("id"), emb.embedding.alias("vec"))

res = knn_exact(queries, base, K).orderBy("query_id", "rank").toPandas()
res_fast = knn_exact_fast(queries, base, K).orderBy("query_id", "rank").toPandas()

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
oracle = con.execute(f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_reduce(
           list_transform(range(1, len(b.embedding)+1),
             i -> (CAST(q.qvec[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
                  * (CAST(q.qvec[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))),
           (acc, x) -> acc + x) AS dist
  FROM embeddings b, q
)
SELECT query_id, neighbor_id, dist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
  FROM scored
) t WHERE rank <= {K} ORDER BY query_id, rank
""").df()

print("spark rows:", len(res), "oracle rows:", len(oracle))
pd.testing.assert_frame_equal(
    res.reset_index(drop=True).astype({"rank": "int64"}),
    oracle.reset_index(drop=True).astype({"rank": "int64"}),
    check_exact=True,
)
print("EXACT MATCH knn_exact vs duckdb (bit-identical doubles)")
pd.testing.assert_frame_equal(
    res_fast.reset_index(drop=True).astype({"rank": "int64"}),
    oracle.reset_index(drop=True).astype({"rank": "int64"}),
    check_exact=False,
    rtol=1e-9,
)
print("MATCH knn_exact_fast vs duckdb (rtol 1e-9)")
same_rank = (res_fast[["query_id", "neighbor_id", "rank"]].values == oracle[["query_id", "neighbor_id", "rank"]].values).all()
print("fast path identical ranking:", same_rank)
spark.stop()
