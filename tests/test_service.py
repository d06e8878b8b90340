"""HTTP query service (S12): request/response parity with the batch path."""

import json
import urllib.request

from pyspark.sql import functions as F

from rabitq_spark.config import RaBitQConfig
from rabitq_spark.index import build_index, search
from rabitq_spark.service import SearchService


def test_service_query_matches_batch_search(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    model = build_index(base, RaBitQConfig(n_clusters=8, nprobe=8))
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]

    with SearchService(spark, model) as svc:
        url = f"http://127.0.0.1:{svc.port}"
        assert urllib.request.urlopen(f"{url}/health").read() == b"Ok"
        req = urllib.request.Request(
            f"{url}/query",
            data=json.dumps({"query": qvec, "top_k": 5, "probe": 8}).encode(),
            headers={"Content-Type": "application/json"},
        )
        got = json.loads(urllib.request.urlopen(req).read())
        m = urllib.request.urlopen(f"{url}/metrics").read().decode()
        assert "queries_total 1" in m
        # malformed request -> 400, not a crash
        bad = urllib.request.Request(f"{url}/query", data=b'{"nope": 1}')
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

    qdf = spark.createDataFrame([(0, qvec)], "query_id long, qvec array<double>")
    want = search(model, qdf, topk=5, nprobe=8).orderBy("rank").collect()
    assert got["ids"] == [r["neighbor_id"] for r in want]
    assert got["scores"] == [r["dist"] for r in want]
