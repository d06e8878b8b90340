"""PageRank over pair graphs: hub dominance, isolated-node teleport,
agreement with a numpy reference iteration."""

import numpy as np

from rabitq_spark.operators.graph import pagerank


def _run(spark, n_nodes, edges, iterations=5):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    e = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = pagerank(nodes, e, iterations=iterations)
    return {r["doc_id"]: r["rank"] for r in out.collect()}


def _numpy_ref(n, edges, iterations=5, d=0.85):
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = np.array([len(x) for x in adj], dtype=float)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - d) / n)
        for u in range(n):
            for v in adj[u]:
                nxt[v] += d * r[u] / deg[u]
        r = nxt
    return r


def test_star_hub_dominates_and_isolated_gets_teleport(spark):
    # star 0-{1..4}, isolated node 5
    edges = [(0, i) for i in range(1, 5)]
    ranks = _run(spark, 6, edges)
    assert ranks[0] > max(ranks[i] for i in range(1, 5))
    assert abs(ranks[5] - 0.15 / 6) < 1e-12  # pure teleport, never linked
    ref = _numpy_ref(6, edges)
    for i in range(6):
        assert abs(ranks[i] - ref[i]) < 1e-9, i


def test_matches_numpy_on_random_graph(spark):
    rng = np.random.RandomState(7)
    n = 40
    edges = list(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.randint(0, n, (80, 2))
            if a != b
        }
    )
    ranks = _run(spark, n, edges)
    ref = _numpy_ref(n, edges)
    for i in range(n):
        assert abs(ranks[i] - ref[i]) < 1e-9, i
