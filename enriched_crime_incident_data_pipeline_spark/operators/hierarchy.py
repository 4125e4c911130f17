"""Hierarchy traversal over parent-pointer tables — the Spark answer
to a recursive CTE.

SQL engines walk org charts / BOMs / category trees with WITH
RECURSIVE; Spark has no recursive CTE, and the naive translation
(join once per level) needs O(depth) shuffles. This operator uses
**pointer doubling**: each round every node's known ancestor jumps to
that ancestor's own known ancestor, accumulating depth — after k
rounds every node knows its 2^k-step ancestor, so a depth-D forest
resolves in ⌈log₂ D⌉ joins. A million-level chain needs 20 rounds,
not a million.

Convergence uses the same scalar-fixpoint trick as connected
components (`datapipe/clusters.py`): total depth is monotone
non-decreasing and stabilizes exactly at the fixpoint; each iterate
is persisted and the previous unpersisted so lineage stays one round
deep.

Contract: ``parent == node`` marks a root. The oracle for
`graph1_tree_paths` is a DuckDB ``WITH RECURSIVE`` — a genuinely
independent formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tree_paths(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 40,
) -> DataFrame:
    """(node, root, depth) for every node of a parent-pointer forest.

    ``edges`` has one row per node; roots point at themselves.
    ``max_rounds`` bounds the doubling loop (covers depth 2^40) —
    a cycle in the input would otherwise never converge.
    """
    labels = edges.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(F.col(parent_col) == F.col(node_col), 0)
        .otherwise(1)
        .cast("long")
        .alias("depth"),
    ).persist()
    total = labels.agg(F.sum("depth")).collect()[0][0] or 0

    for _ in range(max_rounds):
        jump = labels.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("depth").alias("j_depth"),
        )
        nxt = (
            labels.join(jump, labels["anc"] == jump["j_node"])
            .select(
                "node",
                F.col("j_anc").alias("anc"),
                (F.col("depth") + F.col("j_depth")).alias("depth"),
            )
            .persist()
        )
        nxt_total = nxt.agg(F.sum("depth")).collect()[0][0] or 0
        labels.unpersist()
        labels = nxt
        # roots self-loop with depth 0, so total depth is monotone and
        # stabilizes exactly when every node has reached its root
        if nxt_total == total:
            break
        total = nxt_total

    return labels.select(
        "node", F.col("anc").alias("root"), F.col("depth").cast("int").alias("depth")
    )
