"""TF-IDF term weighting over a document corpus.

Classic corpus-analysis operator (keyword extraction, topic drift
monitoring, quality triage). The engine computes a rational-score
variant, ``score = tf * N / df`` (one IEEE multiply + one divide of
integer-derived doubles), instead of ``tf * ln(N/df)``: the ranking
is identical for fixed tf (both are monotone decreasing in df) and
the arithmetic is bit-identical across engines, which makes the
operator exactly oracle-checkable — libm ``ln`` is not guaranteed to
agree bit-for-bit between runtimes.

Scale shape: two hash aggregations (doc_id×term, then term) and one
broadcast join of the tiny df/N relation back onto the term
posting-list; the per-doc top-k window partitions by doc_id, so no
stage ever concentrates the corpus on one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import tokens


def term_frequencies(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — term counts per document."""
    exploded = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    return exploded.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF score.

    Returns (doc_id, term, tf, score, rnk) with deterministic
    tie-break (score desc, term asc).
    """
    tf = term_frequencies(docs)
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf").cast("double") * F.col("n_docs").cast("double"))
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            "score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
