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


def test_service_concurrent_requests_match_batch(spark, sf_dir):
    """N threads hitting /query concurrently must each get exactly the
    batch `search()` answer for their query — the ThreadingHTTPServer +
    shared-SparkSession path has no cross-request state (round-4 verdict
    item 9)."""
    import threading

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    model = build_index(base, RaBitQConfig(n_clusters=8, nprobe=8))
    model.index_df = model.index_df.cache()
    qrows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in qrows}

    qdf = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch = search(model, qdf, topk=5, nprobe=8).toPandas()
    expected = {
        qid: grp.sort_values("rank")["neighbor_id"].tolist()
        for qid, grp in batch.groupby("query_id")
    }

    results: dict[int, list] = {}
    errors: list[Exception] = []

    def hit(port: int, qid: int) -> None:
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query",
                data=json.dumps(
                    {"query": qvecs[qid], "top_k": 5, "probe": 8}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            results[qid] = json.loads(urllib.request.urlopen(req).read())["ids"]
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    with SearchService(spark, model) as svc:
        threads = [
            threading.Thread(target=hit, args=(svc.port, qid)) for qid in qvecs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    assert not errors
    assert results == expected


def test_service_rejects_out_of_bounds_args(spark, sf_dir):
    """top_k/probe are u32-shaped in the reference arg surface
    (crates/service/src/main.rs:55-60): negatives, zero, oversized probe,
    and wrong-dim queries must 400, never crash the server."""
    import urllib.error

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    model = build_index(base, RaBitQConfig(n_clusters=8, nprobe=8))
    qvec = [float(x) for x in emb.first()["embedding"]]

    def post(port: int, payload: dict) -> int:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            return 200
        except urllib.error.HTTPError as e:
            return e.code

    with SearchService(spark, model) as svc:
        p = svc.port
        assert post(p, {"query": qvec, "top_k": 0}) == 400
        assert post(p, {"query": qvec, "top_k": -3}) == 400
        assert post(p, {"query": qvec, "probe": 0}) == 400
        assert post(p, {"query": qvec, "probe": 999}) == 400
        assert post(p, {"query": []}) == 400
        assert post(p, {"query": qvec[:-1]}) == 400
        assert post(p, {"query": "nope"}) == 400
        # server still healthy and serving after the rejects
        assert post(p, {"query": qvec, "top_k": 3, "probe": 8}) == 200
