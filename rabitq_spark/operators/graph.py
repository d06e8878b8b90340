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

from pyspark.sql import DataFrame
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
        neighbor = (
            sym.join(labels, sym.dst == labels.node)
            .select(F.col("src").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.comp") < F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def neardup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup groups from near-dup pairs: every document labeled with its
    component's canonical (minimum) doc id, the component size, and an
    is_dup flag (1 for every non-canonical member — the rows a dedup
    pipeline drops). Mirrors dedup_exact's output contract."""
    from pyspark.sql import Window

    comp = connected_components(
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
