"""Connected components over a pair graph — the step that turns near-dup
PAIRS into dedup GROUPS (keep one canonical doc per component, drop the
rest). The reference has nothing like it; a training-data pipeline cannot
ship without it.

Algorithm: iterative min-label propagation (the Pregel/GraphX formulation).
Each round every node adopts the minimum label among itself and its
neighbors; convergence in O(component diameter) rounds — near-dup graphs
have tiny, dense components, so this is a handful of rounds. Each round is
one distributed join + one aggregation (shuffles keyed by node id); the
driver loop only checks a scalar convergence count. Lineage is truncated
with localCheckpoint each round (iterative plans otherwise grow without
bound — the blocks are retired by the next round's checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node, component = min reachable node id.

    `edges` is undirected (each pair once); isolated nodes keep their own
    id as component. Deterministic: exact components, not approximate.

    Each round is ONE Spark action: the per-node neighbor-min join/agg is
    materialized by localCheckpoint, and the convergence signal (how many
    nodes improved their label) rides the same job as an `observe` metric —
    no separate convergence count job (round-2 verdict). Raises RuntimeError
    if max_iter rounds pass without convergence (advisor: a silent cap would
    return wrong components for graphs of diameter > max_iter).
    """
    sym = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).unionByName(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(node).alias("node"), F.col(node).alias("comp")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
                (F.col("nbr_comp") < F.col("comp"))
                .cast("int")
                .alias("__improved"),
            )
            .observe(obs, F.sum("__improved").alias("changed"))
            .select("node", "comp")
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if not (obs.get["changed"] or 0):
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the pair graph has a component of diameter > max_iter; raise "
        "max_iter (labels would otherwise be silently wrong)"
    )


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(node, comp) via alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log d) rounds instead of min-label
    propagation's O(d), so a 10^6-node chain of templated near-dups
    finishes in ~20 rounds where label propagation needs 10^6. Same exact
    output contract as connected_components.

    Each round is large-star ∘ small-star — two keyed join+agg pairs in
    ONE action (the edge-set checksum rides the materializing job as an
    observe metric). Termination = edge multiset stable; the checksum
    match is then CONFIRMED with an exact exceptAll comparison (one extra
    action, once), so a 2^-64 hash collision cannot silently truncate the
    contraction."""
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    prev_sig = None
    converged = not cur.take(1)  # a pair-free corpus needs zero rounds
    for _ in range(max_iter):
        if converged:
            break
        # large-star: every node u connects its LARGER neighbors to
        # m = min(N(u) ∪ {u}) — symmetric neighbor view
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        ls = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: every node u connects its SMALLER neighbors (and
        # itself) to its min smaller neighbor; edges stay (larger, smaller)
        smin = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smin.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        from pyspark.sql import Observation

        obs = Observation()
        nxt = ss.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            # xor-fold: order-independent, cannot overflow (edges are
            # distinct, so the set signature is sound)
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).localCheckpoint(eager=True)
        sig = (obs.get["n"], obs.get["h"])
        prev, cur = cur, nxt
        if sig == prev_sig:
            if prev.exceptAll(cur).take(1):  # checksum collision: keep going
                prev_sig = None
                continue
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — with O(log d) contraction this indicates a bug or an "
            "astronomically deep graph; raise max_iter"
        )
    comp = cur.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("comp"))
    return (
        nodes.select(F.col(node).alias("node"))
        .join(comp, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "id_a",
    dst: str = "id_b",
    node: str = "doc_id",
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph — centrality
    for near-dup clusters (which template is the hub?) and any doc-link
    analysis. Simplified recurrence (no dangling-mass redistribution; an
    isolated node keeps the teleport value):

        rank⁰ = 1/N;  rankᵏ(v) = (1−d)/N + d · Σ_{u∈N(v)} rankᵏ⁻¹(u)/deg(u)

    Determinism contract: the neighbor sum is a LEFT-TO-RIGHT double fold
    over neighbors ordered by source id (array_sort + F.aggregate — the
    same bit-exact-vs-DuckDB-list_reduce pattern as every float fold in
    this repo); scalar ops (divide, multiply, add) are single IEEE
    operations. The whole iterative computation is therefore hash-checkable
    against a chained-CTE oracle (queries.py::q_pagerank_neardup).

    Scale shape: per iteration one join keyed by src + one aggregation
    keyed by dst; the fold's collect_list is bounded by node degree (tiny
    for near-dup graphs; for power-law webs swap in the decimal-sum merge).
    localCheckpoint truncates the iterative lineage each round.
    """
    n_total = nodes.count()
    # materialize the edge list FIRST: `sym` references it twice and `deg`
    # twice more — without this barrier Spark re-executes the upstream pair
    # pipeline (minhash banding, shingling...) up to 4× inside one job
    # (measured: 21 s -> ~12 s for pagerank_neardup at sf1.0)
    e0 = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # near-dup graphs are small relative to the corpus: size the iterative
    # frames to the data, not to spark.sql.shuffle.partitions — 5 iterations
    # × 3 stages × 32 near-empty tasks was pure scheduling overhead
    # (measured ~2 s/iteration at 250k edges). For web-scale graphs pass
    # pre-partitioned edges and this coalesce is a no-op upward.
    spark = nodes.sparkSession
    # sized from n_total (already counted) — counting `edges` here would
    # re-execute the whole upstream pair pipeline just for the estimate
    n_part = max(
        2,
        min(spark.sparkContext.defaultParallelism, n_total // 50_000 + 1),
    )
    edges_deg = (
        sym.join(deg, "src").repartition(n_part, "src").localCheckpoint(eager=True)
    )
    ids = (
        nodes.select(F.col(node).alias("id"))
        .repartition(n_part, "id")
        .localCheckpoint(eager=True)
    )
    ranks = ids.select("id", F.lit(1.0 / n_total).alias("rank"))
    teleport = (1.0 - damping) / n_total
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks, edges_deg.src == ranks.id)
            .select(
                "dst", "src", (F.col("rank") / F.col("deg")).alias("val")
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "val"))),
                    F.lit(0.0),
                    lambda a, x: a + x["val"],
                ).alias("contrib")
            )
        )
        ranks = (
            ids.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("id").alias(node), "rank")


def neardup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup groups from near-dup pairs: every document labeled with its
    component's canonical (minimum) doc id, the component size, and an
    is_dup flag (1 for every non-canonical member — the rows a dedup
    pipeline drops). Mirrors dedup_exact's output contract.

    Uses star contraction (O(log d) rounds), so even a degenerate chain of
    templated near-dups — the advisor's diameter > max_iter scenario that
    makes label propagation raise — resolves exactly."""
    from pyspark.sql import Window

    comp = connected_components_star(
        pairs.select("id_a", "id_b"), docs.select(id_col), node=id_col
    )
    w = Window.partitionBy("group_id")
    return comp.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_id")
    ).select(
        "doc_id",
        "group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") != F.col("group_id")).cast("int").alias("is_dup"),
    )
