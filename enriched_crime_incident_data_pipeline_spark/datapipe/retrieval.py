"""Keyword retrieval scoring over the token posting list.

BM25 is the retrieval baseline every corpus tool reaches for; its
canonical idf is ``ln((N - df + 0.5) / (df + 0.5))``, and ``ln`` is a
transcendental whose last ulp differs between the JVM and libm. This
module scores with the RATIONAL idf — the ratio itself, un-logged —
which preserves the ranking direction per term (ln is monotone) while
keeping every arithmetic step a correctly-rounded double op, so Spark
and the DuckDB oracle agree bit-for-bit (the same trade
``datapipe/lm.py`` makes for perplexity). Classic BM25 constants
k1=1.2, b=0.75.

Caveat: monotonicity holds PER TERM only. The per-document score is a
SUM of per-term weights, and a sum of rational idfs is not a monotone
transform of the sum of ln-idfs, so for multi-term queries the top-k
ORDER can diverge from classic ln-idf BM25 (two documents matching
different term subsets may swap ranks). This is the deliberate trade
for bit-exact cross-engine oracle parity; callers needing textbook
BM25 ordering should apply ``ln`` to the idf ratio and accept
last-ulp engine divergence.

Scale shape: one token explode (map-only after ``fan_out``), df and
doc-length aggregations are map-side-combinable groupBys, the query
term list is tiny and broadcast, and the per-document term fold is
order-pinned (sort by term, sequential aggregate) — one shuffle on
doc_id. Top-k compiles to TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import tokens
from enriched_crime_incident_data_pipeline_spark.operators.parallelism import (
    fan_out,
)

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    n_terms: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for the conjunctive-ish query made of the
    corpus' ``n_terms`` most frequent tokens (deterministic query
    derivation keeps the op self-contained; ties break on the token).
    Returns ``(doc_id, n_terms_hit, score)`` ranked by rational-idf
    BM25 (see module docstring), score ties broken by ascending id.
    """
    tok = fan_out(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avgdl"
        ),
    )
    df_tbl = tok.select(id_col, "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("_df")
    )
    terms = df_tbl.orderBy(F.desc("_df"), "tok").limit(n_terms)
    tf = (
        tok.join(F.broadcast(terms), "tok")
        .groupBy(id_col, "tok", "_df")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf_r",
            (
                F.col("_n_docs").cast("double")
                - F.col("_df").cast("double")
                + F.lit(0.5)
            )
            / (F.col("_df").cast("double") + F.lit(0.5)),
        )
        .withColumn(
            "_w",
            F.col("_idf_r")
            * (
                F.col("_tf").cast("double") * F.lit(BM25_K1 + 1.0)
            )
            / (
                F.col("_tf").cast("double")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B)
                    * (F.col("_dl").cast("double") / F.col("_avgdl"))
                )
            ),
        )
    )
    # order-pinned per-doc fold: sort the (term, weight) pairs by term
    # and add sequentially, matching the oracle's sum(w ORDER BY tok)
    folded = (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.array_sort(
                F.collect_list(F.struct(F.col("tok"), F.col("_w")))
            ).alias("_arr"),
        )
        .select(
            id_col,
            "n_terms_hit",
            F.aggregate(
                "_arr", F.lit(0.0), lambda acc, x: acc + x["_w"]
            ).alias("score"),
        )
    )
    return folded.orderBy(F.desc("score"), id_col).limit(k)


def bm25_feedback_topk(
    docs: DataFrame,
    n_terms: int = 3,
    fb_docs: int = 10,
    fb_terms: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance feedback (Rocchio-style query expansion) on
    top of :func:`bm25_topk`'s rational-idf scoring: score the base
    query (the corpus' ``n_terms`` most frequent tokens), take the
    top ``fb_docs`` documents as the positive feedback set, promote
    the ``fb_terms`` most frequent tokens of that set that are NOT
    already query terms (count desc, token asc — the classic
    positive-centroid term selection reduced to its deterministic
    integer core), and re-score the corpus with the expanded term
    set. Returns the final top-``k`` ``(doc_id, n_terms_hit, score)``.

    Everything heavy is shared with the base pass: the token explode,
    document lengths, and df table are computed ONCE (pinned) and
    both scoring passes read them; the feedback-doc id list and both
    term sets are tiny broadcast relations. The per-document fold is
    order-pinned (sort by term, sequential add) exactly as in
    bm25_topk, so the oracle reproduces scores bit-for-bit modulo
    the documented rational-idf trade."""
    tok = (
        fan_out(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .localCheckpoint(eager=False)
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avgdl"
        ),
    )
    df_tbl = tok.select(id_col, "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("_df")
    ).localCheckpoint(eager=False)

    def score(terms: DataFrame) -> DataFrame:
        tf = (
            tok.join(F.broadcast(terms), "tok")
            .groupBy(id_col, "tok", "_df")
            .agg(F.count(F.lit(1)).alias("_tf"))
        )
        scored = (
            tf.join(dl, id_col)
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "_idf_r",
                (
                    F.col("_n_docs").cast("double")
                    - F.col("_df").cast("double")
                    + F.lit(0.5)
                )
                / (F.col("_df").cast("double") + F.lit(0.5)),
            )
            .withColumn(
                "_w",
                F.col("_idf_r")
                * (F.col("_tf").cast("double") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("_tf").cast("double")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B)
                        * (F.col("_dl").cast("double") / F.col("_avgdl"))
                    )
                ),
            )
        )
        return (
            scored.groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
                F.array_sort(
                    F.collect_list(F.struct(F.col("tok"), F.col("_w")))
                ).alias("_arr"),
            )
            .select(
                id_col,
                "n_terms_hit",
                F.aggregate(
                    "_arr", F.lit(0.0), lambda acc, x: acc + x["_w"]
                ).alias("score"),
            )
        )

    base_terms = df_tbl.orderBy(F.desc("_df"), "tok").limit(n_terms)
    fb_ids = (
        score(base_terms)
        .orderBy(F.desc("score"), id_col)
        .limit(fb_docs)
        .select(id_col)
    )
    expansion = (
        tok.join(F.broadcast(fb_ids), id_col, "leftsemi")
        .join(F.broadcast(base_terms.select("tok")), "tok", "left_anti")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), "tok")
        .limit(fb_terms)
        .select("tok")
        .join(df_tbl, "tok")  # re-attach df for the scoring pass
        .select("tok", "_df")
    )
    expanded = base_terms.select("tok", "_df").unionByName(expansion)
    return score(expanded).orderBy(F.desc("score"), id_col).limit(k)
