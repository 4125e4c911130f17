"""Blocked similarity self-joins: 2-D grid proximity and fuzzy
string matching.

Two more join families SQL engines lack natively, both built on the
same scale pattern as the engine's range/LSH joins: generate
candidates with an EQUI-join on a derived blocking key (so the plan
is a hash join, never a cartesian/BroadcastNestedLoop), then apply
the exact predicate as a residual filter.

Reference tie-in: the reference's `location` strings are raw PDF
addresses (SURVEY.md §1.4) — near-identical variants ("BLK 12 MAIN
ST" vs "BLK 13 MAIN ST") and nearby coordinates are exactly what
these operators cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_proximity_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (id_a < id_b) within Chebyshev distance ``radius``
    (integer coordinates): |Δx| ≤ r AND |Δy| ≤ r.

    Blocking: cells of side ``radius``; the left side explodes to its
    3×3 cell neighborhood, the right side keeps its home cell, and
    the join is an equi-join on the cell key. Any qualifying pair is
    ≤ 1 cell apart in each axis, so it is found exactly once (via the
    right point's unique home cell) — no post-dedup needed. Shuffle
    volume is 9·|points| + |points|, versus |points|² for the naive
    theta join.
    """
    cx = F.floor(F.col(x_col) / radius)
    cy = F.floor(F.col(y_col) / radius)
    offsets = F.expr(
        "array(-1,0,1)"
    )
    left = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("xa"),
        F.col(y_col).alias("ya"),
        F.explode(
            F.flatten(
                F.transform(
                    offsets,
                    lambda dx: F.transform(
                        F.expr("array(-1,0,1)"),
                        lambda dy: F.struct(
                            (cx + dx).alias("cx"), (cy + dy).alias("cy")
                        ),
                    ),
                )
            )
        ).alias("cell"),
    ).select("id_a", "xa", "ya", "cell.cx", "cell.cy")
    right = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    pairs = left.join(right, ["cx", "cy"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.filter(
        (F.abs(F.col("xa") - F.col("xb")) <= radius)
        & (F.abs(F.col("ya") - F.col("yb")) <= radius)
    ).select(
        "id_a",
        "id_b",
        (F.col("xb") - F.col("xa")).alias("dx"),
        (F.col("yb") - F.col("ya")).alias("dy"),
    )


def fuzzy_name_pairs(
    names: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    block_tail: int = 1,
) -> DataFrame:
    """Candidate near-duplicate name pairs: block on (all-but-last
    ``block_tail`` characters, length), verify with exact
    levenshtein ≤ ``max_distance``.

    Prefix blocking bounds each block at |alphabet|^tail rows, so
    the self-join is linear in the input; like any LSH-style scheme
    it trades recall (pairs differing in an earlier character fall
    in different blocks) for never forming the quadratic product.
    The levenshtein residual is exact on both engines.

    With ``block_tail = 1`` every intra-block pair is automatically
    within distance 1, so the verify never rejects and the resulting
    clusters are cliques; a WIDER tail with a tighter verify (e.g.
    tail 2, distance 1) is the configuration where transitive
    chaining genuinely occurs — what er3's cohesion audit measures.
    """
    blocked = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.concat(
            F.expr(
                f"substring({name_col}, 1,"
                f" length({name_col}) - {int(block_tail)})"
            ),
            F.lit("#"),
            F.length(name_col).cast("string"),
        ).alias("block"),
    )
    a = blocked.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "block"
    )
    b = blocked.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            # bounded levenshtein (threshold arg): early-exits past
            # max_distance and returns -1 — ~2× on the verify (r8
            # measured); within-threshold values equal the unbounded
            # distance, so outputs are unchanged
            "distance",
            F.levenshtein(
                F.col("name_a"), F.col("name_b"), int(max_distance)
            ),
        )
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )


def grid_nearest_neighbor(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """Bounded-radius nearest neighbor: for every point, the closest
    OTHER point within Chebyshev radius ``radius`` (squared-euclidean
    metric, lowest id on ties) — ``(id, nn_id, d2)``. Points with no
    neighbor in range are absent (the bounded-radius contract is what
    makes the problem blockable; unbounded NN degenerates to a global
    join).

    Same grid blocking as :func:`grid_proximity_join` (query side
    explodes its 3×3 cell neighborhood, target side keeps its home
    cell, equi-join on the cell) but DIRECTED, and the argmin is a
    map-side-combinable ``min_by`` aggregation per query point —
    never a per-point sort window. All distance math is integer →
    exact.
    """
    cx = F.floor(F.col(x_col) / radius)
    cy = F.floor(F.col(y_col) / radius)
    neigh = F.expr("array(-1,0,1)")
    left = points.select(
        F.col(id_col).alias("qid"),
        F.col(x_col).alias("xa"),
        F.col(y_col).alias("ya"),
        F.explode(
            F.flatten(
                F.transform(
                    neigh,
                    lambda dx: F.transform(
                        F.expr("array(-1,0,1)"),
                        lambda dy: F.struct(
                            (cx + dx).alias("cx"), (cy + dy).alias("cy")
                        ),
                    ),
                )
            )
        ).alias("cell"),
    ).select("qid", "xa", "ya", "cell.cx", "cell.cy")
    right = points.select(
        F.col(id_col).alias("nn_id"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    d2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    cand = (
        left.join(right, ["cx", "cy"])
        .filter(F.col("qid") != F.col("nn_id"))
        .filter(
            (F.abs(F.col("xa") - F.col("xb")) <= radius)
            & (F.abs(F.col("ya") - F.col("yb")) <= radius)
        )
        .select("qid", "nn_id", d2.cast("bigint").alias("d2"))
    )
    return cand.groupBy("qid").agg(
        F.min_by(
            F.struct(F.col("nn_id"), F.col("d2")),
            F.struct(F.col("d2"), F.col("nn_id")),
        ).alias("_nn")
    ).select(
        F.col("qid").alias(id_col),
        F.col("_nn.nn_id").alias("nn_id"),
        F.col("_nn.d2").alias("d2"),
    )


def deletion_variant_pairs(
    names: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
    window: int = 6,
    max_ids_per_variant: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate name pairs via DELETION-NEIGHBORHOOD
    blocking (FastSS / SymSpell symmetric deletes), restricted to the
    last ``window`` character positions: each name emits itself plus
    the ``window`` variants with one suffix-window char deleted;
    candidates equi-join on the variant string and verify with exact
    (bounded) levenshtein.  ``(id_a, id_b, distance)``.

    COMPLETE for distance-1 edits whose site lies within the last
    ``window`` positions OF THE LONGER STRING: a substitution at
    position −p (p ≤ window) makes both names share that position's
    deletion variant; an insert/delete is caught when deleting the
    extra char from the longer side is a window variant — i.e. the
    site is ≤ window from the LONGER string's end (an insertion at
    exactly −window of the shorter lands at −(window+1) of the
    longer and is missed — the boundary hypothesis found when this
    contract was first stated loosely; pinned in
    test_properties.py).  The
    r8 measured gain over prefix blocking is 3757 → 10000 bp recall
    on er2's exhaustive truth (see registry/quality.py
    q_er4_deletion_blocking); completeness is property-pinned against
    random suffix-window edits in test_properties.py.  7 keys/name,
    blocks bounded like any equi-key scheme; ``window`` dials the
    completeness span vs key volume.

    Skew guard (OPT-IN, r10 advisor — default None is exact, like
    two_hop_reach's max_mid_degree): when ``max_ids_per_variant`` is
    set, variant values shared by more than that many distinct ids
    are anti-joined out BEFORE the self-join (frame_match_pairs'
    hot-key cap) — a degenerate name domain (many identical names)
    would otherwise fan out n²/2 pairs from one variant bucket. The
    cap trades recall on hot buckets for a bounded join, a
    recall-affecting choice the CALLER must make knowingly; the
    previous always-on default of 256 silently dropped pairs on any
    bucket above the cap (measured safe only on the TPC-H name
    domain, max bucket 38 ids at every SF — er4 passes 256
    explicitly and its pinned output is unchanged).
    """
    var = (
        names.select(
            F.col(id_col).alias("id"),
            F.col(name_col).alias("nm"),
            F.explode(
                F.array(*[F.lit(p) for p in range(window + 1)])
            ).alias("p"),
        )
        .filter(F.length("nm") >= F.col("p"))
        .select(
            "id",
            "nm",
            F.when(F.col("p") == 0, F.col("nm"))
            .otherwise(
                F.concat(
                    F.expr("substring(nm, 1, length(nm) - p)"),
                    F.expr("substring(nm, length(nm) - p + 2, p - 1)"),
                )
            )
            .alias("v"),
        )
    )
    if max_ids_per_variant is not None:
        hot = (
            var.groupBy("v")
            .agg(F.count_distinct("id").alias("_nid"))
            .filter(F.col("_nid") > max_ids_per_variant)
            .select("v")
        )
        var = var.join(hot, "v", "left_anti")
    a, b = var.alias("a"), var.alias("b")
    return (
        a.join(b, F.col("a.v") == F.col("b.v"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.nm").alias("na"),
            F.col("b.nm").alias("nb"),
        )
        .distinct()
        .withColumn(
            "distance",
            F.levenshtein(F.col("na"), F.col("nb"), int(max_distance)),
        )
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )
