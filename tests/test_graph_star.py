"""Star-contraction connected components (Kiveris et al. SoCC'14):
equivalence with min-label propagation, and the long-chain case that
label propagation cannot finish in bounded rounds."""

import random


def _cc_python(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, v)
    return {v: comp[find(v)] for v in range(n_nodes)}


def _run(spark, fn, n_nodes, edges, **kw):
    e = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )
    if not edges:
        e = e.filter("id_a <> id_a")  # empty with schema
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    return {
        r.node: r.comp for r in fn(e, nodes, node="doc_id", **kw).collect()
    }


def test_star_matches_minlabel_and_unionfind_on_random_graphs(spark):
    from rabitq_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2 + trial * 5)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _cc_python(n, edges)
        got_star = _run(spark, connected_components_star, n, edges)
        got_label = _run(spark, connected_components, n, edges)
        assert got_star == want == got_label


def test_star_resolves_chain_deeper_than_round_budget(spark):
    """A 120-node path (diameter 119) resolves in <= 50 star rounds —
    min-label propagation provably cannot (it raises); star contraction
    needs O(log d)."""
    import pytest

    from rabitq_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    n = 120
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _run(spark, connected_components_star, n, edges)
    assert got == {i: 0 for i in range(n)}
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(spark, connected_components, n, edges, max_iter=10)


def test_star_empty_edges_all_isolated(spark):
    from rabitq_spark.operators.graph import connected_components_star

    got = _run(spark, connected_components_star, 5, [])
    assert got == {i: i for i in range(5)}


def test_triangle_join_counts_each_once(spark):
    # reuse the canonical-orientation plan from q_triangle_count on a known
    # graph: K4 on {0,1,2,3} (4 triangles, each node in 3) + pendant 4-5
    from pyspark.sql import functions as F

    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(4, 5)]
    e = spark.createDataFrame(edges, ["a", "b"])
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    assert tri.count() == 4
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("n"))
        .groupBy("n")
        .count()
        .collect()
    )
    counts = {r["n"]: r["count"] for r in per_node}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}
