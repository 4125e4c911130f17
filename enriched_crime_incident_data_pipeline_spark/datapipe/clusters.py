"""Duplicate-cluster formation: connected components over candidate
pairs.

Pair-level dedup (MinHash/LSH, SimHash, embedding cosine —
``datapipe/dedup.py``) emits *edges*; an actual corpus clean needs
*clusters* with one canonical survivor each, i.e. connected
components of the candidate graph (A~B and B~C must collapse to one
group even when A~C was never emitted as a pair).

Implementation: iterative min-label propagation, the standard
DataFrame-only formulation (GraphX/GraphFrames do the same under the
hood). Each round is one join + one groupBy; labels are monotonically
non-increasing, so the fixpoint is reached in O(graph diameter)
rounds and detected by a scalar ``sum(label)`` comparison (one cheap
action per round against the persisted iterate — no row-level diff).

Scale notes: near-dup graphs are overwhelmingly tiny components
(pairs → triangles), so diameter — and the round count — is small.
Each round shuffles |edges| + |nodes| rows, partitioned by key; the
iterate is persisted and the previous one unpersisted so lineage
stays one round deep. (The large-star/small-star variant halves round
count on adversarial long chains; plain propagation is the right
trade for dedup graphs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 50
) -> DataFrame:
    """Component label (the component's minimum node id) for every
    node that appears in ``edges``. Returns ``(node, cluster_id)``.
    """
    sym = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["dst"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("_nbr_min", "label")).alias("label"),
            )
            .persist()
        )
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select("node", F.col("label").alias("cluster_id"))


def dup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every document its duplicate-cluster id (minimum doc id
    of its component; docs in no pair are their own singleton) and a
    canonical flag — the keep/drop verdict of a corpus dedup pass.
    """
    cc = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def dedup_drop_list(
    members: DataFrame,
    doc_sizes: DataFrame,
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Keeper selection over duplicate clusters: per cluster keep the
    LONGEST member (ties → lowest id) and emit the drop-list
    ``(doc_id, cluster_id, keeper_id)`` — the rows a corpus clean
    deletes. Keep-longest is the standard near-dup keeper heuristic
    (the duplicate with the most content survives).

    The keeper argmax is ``max_by`` on a (size, -id) struct — a
    map-side-combinable aggregation, not a per-cluster sort window —
    so one shuffle on the cluster id at any scale; the keeper table
    (one row per cluster) broadcasts back onto the members."""
    sized = members.join(doc_sizes, node_col)
    keepers = sized.groupBy(cluster_col).agg(
        F.max_by(
            node_col,
            F.struct(F.col(size_col), (-F.col(node_col)).alias("_neg")),
        ).alias("keeper_id")
    )
    return (
        sized.join(F.broadcast(keepers), cluster_col)
        .filter(F.col(node_col) != F.col("keeper_id"))
        .select(
            F.col(node_col).alias("doc_id"), cluster_col, "keeper_id"
        )
    )
