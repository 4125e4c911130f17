"""Duplicate-cluster formation: connected components over candidate
pairs.

Pair-level dedup (MinHash/LSH, SimHash, embedding cosine —
``datapipe/dedup.py``) emits *edges*; an actual corpus clean needs
*clusters* with one canonical survivor each, i.e. connected
components of the candidate graph (A~B and B~C must collapse to one
group even when A~C was never emitted as a pair).

Implementation: iterative min-label propagation with POINTER-JUMPING
compression, the standard DataFrame-only formulation (GraphX /
GraphFrames' min-propagation plus the path-halving step of
union-find). Each round is (a) propagate: every node takes the min
label over itself and its neighbors — one join + one groupBy — and,
once the round count exceeds ``jump_after`` (i.e. the graph's
diameter is proven larger than typical near-dup components), (b)
compress: ``label(v) ← label(label(v))`` — one self-join on the
label table. Propagation alone needs O(diameter) rounds, which an
adversarial duplicate *chain* (boilerplate series: doc₁~doc₂~…~docₙ)
turns into O(n); compression doubles the distance a label has
travelled every round, so the fixpoint arrives in O(log diameter)
rounds on any graph (pinned by the long-chain test in
``tests/test_graph_sketch.py``) while the typical pairs-and-triangles
dedup graph never pays for the extra join. Labels are monotonically
non-increasing,
so the fixpoint is detected by a scalar ``sum(label)`` comparison
(one cheap action per round against the persisted iterate — no
row-level diff).

Scale notes: each round shuffles |edges| + |nodes| rows, partitioned
by key; the iterate is persisted and the previous one unpersisted, and
every ``_CHECKPOINT_EVERY`` rounds the iterate is ``localCheckpoint``-ed
so the logical plan cannot grow with round count (unbounded iterate
lineage is the classic driver-OOM failure of DataFrame CC loops).
Near-dup graphs are overwhelmingly tiny components (pairs →
triangles) where 2-3 rounds suffice; the log-round guarantee is the
insurance for the pathological shapes a 100 TB corpus will contain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# localCheckpoint cadence: truncates iterate lineage so plan size is
# bounded by the cadence, not the round count
_CHECKPOINT_EVERY = 4


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    jump_after: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Component label (the component's minimum node id) for every
    node that appears in ``edges``. Returns ``(node, cluster_id)``.

    The first ``jump_after`` rounds are plain propagation (one join +
    one groupBy — the cheapest round shape, and all that near-dup
    graphs ever need); if the fixpoint hasn't arrived by then the
    graph has diameter > ``jump_after`` and every later round adds the
    pointer-jumping compression join, giving O(log diameter) total
    rounds on adversarial chains without taxing the common case.

    Pass ``stats={}`` to receive ``stats["rounds"]`` — the number of
    rounds executed before the fixpoint.
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
    rounds = 0
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("_nbr_min"))
        )
        new_labels = labels.join(
            nbr_min, labels["node"] == nbr_min["dst"], "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("_nbr_min", "label")).alias("label"),
        )
        if it >= jump_after:
            # pointer jumping: label(v) ← label(label(v)). Every label
            # value is itself a node id present in the table (labels
            # start as node ids and min() only moves within that
            # domain), so the lookup always hits; left+coalesce guards
            # the invariant anyway. Doubles the distance a label has
            # travelled per round — O(diameter) becomes O(log
            # diameter) on the long-chain graphs that get here.
            parent = new_labels.select(
                F.col("node").alias("_pnode"), F.col("label").alias("_plabel")
            )
            new_labels = new_labels.join(
                parent, new_labels["label"] == parent["_pnode"], "left"
            ).select(
                "node",
                F.coalesce("_plabel", "label").alias("label"),
            )
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            # eager localCheckpoint: cuts the iterate's lineage so the
            # logical plan cannot grow with round count
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        rounds = it + 1
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
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
