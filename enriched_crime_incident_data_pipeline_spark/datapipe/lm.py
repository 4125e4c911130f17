"""Unigram language-model quality scoring (perplexity proxy).

The classic corpus-quality signal (CCNet-style): train a unigram LM
on the corpus itself, score each document by how "typical" its tokens
are, and filter/bucket on the score. Real pipelines score in log
space; log is a transcendental whose last ulp differs between the JVM
and libm, so the cross-engine-exact score used here is the rational
**mean inverse token probability** under add-one smoothing:

    score(doc) = (1/n) · Σ_i (N + V) / (count(tok_i) + 1)

— a monotone signal for the same failure mode (rare/garbage-token
documents score high), built entirely from integer-derived divisions
and a position-ordered sequential double fold, so Spark and any
ordered-aggregate SQL engine agree bit-for-bit.

Scale design: token counts are a groupBy on the token (map-side
combinable, no skew pathology — hot tokens partial-aggregate);
the count table is a broadcast dimension (cap it with the same
document-frequency vocabulary pruning ``ta10_oov_rate`` uses when the
open vocabulary outgrows broadcast range); the per-document fold is
one shuffle on doc_id. The corpus never self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import tokens
from enriched_crime_incident_data_pipeline_spark.operators.parallelism import (
    fan_out,
)


def unigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, n_tokens, mean_inv_prob)`` per document with ≥1 token.

    Per-token term (N+V)/(c+1) is a single exact-rounded double
    division of integer-valued operands; the per-document sum folds
    the terms in token-position order (a sequential ``F.aggregate``
    over the document's own token array), and the mean divides once
    at the end — every double op has a fixed operand order, so the
    result is reproducible bit-for-bit across engines and
    partitionings.

    r5 shape: the count table rides as ONE broadcast map column and
    the fold runs over each document's own token array in place —
    the document relation never shuffles for scoring at all (the r4
    formulation exploded to per-token rows, broadcast-joined counts,
    then re-grouped with collect_list + array_sort to restore
    position order; same bits, one corpus-wide shuffle more). The
    broadcast size is the same vocabulary table either way — cap it
    with document-frequency pruning when the open vocabulary
    outgrows broadcast range.
    """
    tok = fan_out(docs).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    counts = (
        tok.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("c")))
        ).alias("_cmap"),
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("v"),
    )
    nv = (F.col("n_total") + F.col("v")).cast("double")
    scored = tok.crossJoin(F.broadcast(model)).select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            "_toks",
            F.lit(0.0),
            lambda acc, t: acc
            + nv
            / (F.element_at(F.col("_cmap"), t) + F.lit(1)).cast("double"),
        ).alias("_sum_ip"),
    )
    return scored.select(
        id_col,
        "n_tokens",
        (F.col("_sum_ip") / F.col("n_tokens").cast("double")).alias(
            "mean_inv_prob"
        ),
    )

def with_unigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """All input columns + ``(n_tokens, mean_inv_prob)`` appended —
    the quality-FILTER shape (r5). Because scoring is now a column
    expression over each row's own token array (broadcast count-map),
    a consumer that only wants to filter on quality needs NO join
    back to the id table: the score rides the document row through
    the filter, one exchange fewer than scores→filter→join. Same
    bits as :func:`unigram_lm_scores`."""
    toks = tokens(F.col(text_col))
    counts = (
        fan_out(docs)
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    model = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("c")))
        ).alias("_cmap"),
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("v"),
    )
    nv = (F.col("n_total") + F.col("v")).cast("double")
    return (
        docs.crossJoin(F.broadcast(model))
        .withColumn("n_tokens", F.size(toks).cast("bigint"))
        .withColumn(
            "mean_inv_prob",
            F.aggregate(
                toks,
                F.lit(0.0),
                lambda acc, t: acc
                + nv
                / (
                    F.element_at(F.col("_cmap"), t) + F.lit(1)
                ).cast("double"),
            )
            / F.col("n_tokens").cast("double"),
        )
        .drop("_cmap", "n_total", "v")
    )


def seed_lm_scores(
    seed_docs: DataFrame,
    score_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-move quality scoring: the LM is trained on a
    HIGH-QUALITY SEED corpus (CCNet scores CommonCrawl by perplexity
    under a Wikipedia-trained model), then every candidate document
    is scored by its mean inverse token probability under that seed
    model — low = seed-like, high = out-of-domain/garbage. Tokens the
    seed never saw take the add-one-smoothed maximum term
    ``(N + V) / 1``.

    Same bit-exactness contract as :func:`unigram_lm_scores`
    (rational per-token terms, position-ordered fold); same scale
    shape — seed counts are a broadcast dimension (seed corpora are
    curated and small relative to the crawl), candidates shuffle once
    on ``id_col``, nothing self-joins.
    """
    seed_tok = fan_out(seed_docs).select(
        F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = seed_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    model = counts.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("c")))
        ).alias("_cmap"),
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("v"),
    )
    tok = fan_out(score_docs).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    nv = (F.col("n_total") + F.col("v")).cast("double")
    # r5 shape (same as unigram_lm_scores): broadcast count-map, fold
    # in place over each candidate's token array — candidates never
    # shuffle; unseen-by-seed tokens coalesce to count 0 (the add-one
    # maximum term), exactly the old left-join semantics.
    scored = tok.crossJoin(F.broadcast(model)).select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            "_toks",
            F.lit(0.0),
            lambda acc, t: acc
            + nv
            / (
                F.coalesce(
                    F.element_at(F.col("_cmap"), t), F.lit(0)
                )
                + F.lit(1)
            ).cast("double"),
        ).alias("_sum_ip"),
    )
    return scored.select(
        id_col,
        "n_tokens",
        (F.col("_sum_ip") / F.col("n_tokens").cast("double")).alias(
            "seed_mean_inv_prob"
        ),
    )
