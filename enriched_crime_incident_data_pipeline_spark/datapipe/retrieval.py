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


def build_postings_blocks(
    docs: DataFrame,
    block: int = 64,
    shard_mod: int = 37,
    shard: int = 0,
    max_df_num: int = 9,
    max_df_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One term-shard of a blocked inverted index — the physical
    artifact a distributed search/dedup index actually materializes,
    with per-block skip metadata and the exact delta-encoded size.

    Term-sharded: only tokens hashing into ``shard`` (md5 mod
    ``shard_mod``) are built here — index construction at 100 TB is
    embarrassingly parallel across term shards, and each shard's
    build never sees another shard's postings. Within the shard,
    posting lists are doc-id-ordered and cut into ``block``-entry
    blocks; per block we emit ``(min_docid, max_docid)`` — the
    skip-list bounds a query-time scan prunes on — and ``gap_bits``,
    the exact bit size of the delta encoding (first doc-id of each
    block raw, then gaps), i.e. ``length(bin(x))`` summed. All
    integer arithmetic — exact in any engine.

    Tokens appearing in more than ``max_df_num/max_df_den`` of the
    corpus are dropped (relative stopword cap — their posting lists
    are the classic index skew, and real indexes elide them); the
    cap is the integer predicate ``den*df <= num*n_docs``,
    scale-free across SFs.

    Shape: explode → map-side-combinable DISTINCT on (token, doc)
    (occurrences collapse before the wire) → one window pass per
    token partition computing rank, df (count over the same
    partition — no join-back) and the lagged gap → a group-by that
    reuses the token partitioning. Two data exchanges total (plus the
    O(1)-row scalar doc-count broadcast); the corpus text never
    shuffles (only (token, doc_id) pairs do). Hot-but-under-cap
    tokens serialize their own posting list through one task — the
    inherent index-build skew; shrink ``max_df_num/den`` to shed it.
    """
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        hash32,
    )
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("docid"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    post = toks.filter(
        hash32(F.concat(F.lit("shard:"), F.col("token"))) % shard_mod
        == shard
    ).distinct()

    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("token").orderBy("docid")
    wp = Window.partitionBy("token")
    ranked = (
        post.join(F.broadcast(n_docs))
        .withColumn("df", F.count(F.lit(1)).over(wp))
        .filter(
            F.lit(max_df_den) * F.col("df")
            <= F.lit(max_df_num) * F.col("n_docs")
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prev", F.lag("docid").over(w))
    )
    cost = F.when(
        (F.col("rn") - 1) % block == 0, F.length(F.bin(F.col("docid")))
    ).otherwise(F.length(F.bin(F.col("docid") - F.col("prev"))))
    return (
        ranked.withColumn(
            "block_id",
            F.expr(f"CAST((rn - 1) DIV {block} AS INT)"),
        )
        .withColumn("bits", cost)
        .groupBy("token", "df", "block_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("block_len"),
            F.min("docid").alias("min_docid"),
            F.max("docid").alias("max_docid"),
            F.sum("bits").cast("bigint").alias("gap_bits"),
        )
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            "block_id",
            "block_len",
            "min_docid",
            "max_docid",
            "gap_bits",
        )
    )


def trigram_substring_search(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Indexed substring search (the pg_trgm / code-search shape):
    trigram pruning + exact residual verify. Returns
    ``(doc_id, pos)`` — the 1-based first occurrence — for every
    document whose raw text contains ``query``.

    A document can contain the query only if it contains every one
    of the query's character trigrams, so the scan applies the
    conjunctive gram-containment filter FIRST — |Q| native ``instr``
    probes per row (static literals, whole-stage codegen; a
    per-position gram extraction was measured 14× slower at sf1
    because every position paid an interpreted lambda) — and only
    the surviving candidates, a set bounded by the true-match count
    times the trigram false-positive rate, get the exact full-query
    ``instr`` verify. ZERO shuffles, zero joins: the whole operator
    is one streaming scan, which is exactly what conjunctive
    posting-list intersection (the ret4 artifact's read path)
    degenerates to when executed scan-side.

    Trigram containment over-approximates substring containment
    (grams can match at scattered positions), which is exactly why
    the residual verify exists; the oracle is the DEFINITIONAL
    direct scan, so correctness of the pruning (candidates ⊇
    matches) is proven by equality, not assumed.
    """
    qgrams = sorted({query[i : i + 3] for i in range(len(query) - 2)})
    if not qgrams:
        raise ValueError("query must be at least 3 characters")

    t = F.col(text_col)
    gram_filter = F.lit(True)
    for g in qgrams:
        gram_filter = gram_filter & (F.instr(t, g) > 0)
    return (
        docs.filter(gram_filter)
        .select(
            F.col(id_col),
            F.instr(t, query).cast("bigint").alias("pos"),
        )
        .filter(F.col("pos") > 0)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level phrase query over positional postings — the
    search primitive ret4's blocked index serves at read time
    ("these exact tokens, adjacent, in order"): returns
    ``(doc_id, n_occurrences)`` counting every occurrence,
    including overlapping ones (the phrase "table table" matches
    twice in "table table table").

    Positional-intersection shape: the token explode keeps ONLY the
    phrase's terms (a literal IN filter at the scan — nothing else
    leaves it), and the i-th term joins on ``(doc, first_pos + i)``
    — k−1 hash equi-joins over term-posting relations, work bounded
    by the phrase terms' posting sizes, never the corpus token
    stream. Phrases made of stopwords inherit those terms' posting
    skew — the same caveat (and the same df-cap remedy) as ret4.
    """
    terms = [t for t in phrase.split() if t]
    if not terms:
        raise ValueError("empty phrase")
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(tokens(F.col(text_col))).alias("_p", "_t"),
    ).filter(F.col("_t").isin(*set(terms)))
    out = toks.filter(F.col("_t") == terms[0]).select("_d", "_p")
    for i, t in enumerate(terms[1:], start=1):
        nxt = toks.filter(F.col("_t") == t).select(
            F.col("_d").alias("_d2"), (F.col("_p") - i).alias("_p2")
        )
        out = out.join(
            nxt,
            (out["_d"] == nxt["_d2"]) & (out["_p"] == nxt["_p2"]),
        ).select("_d", "_p")
    return out.groupBy(F.col("_d").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )


def self_retrieval_mrr(
    docs: DataFrame,
    every: int = 50,
    cap: int = 20000,
    n_terms: int = 2,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval-quality EVAL harness: known-item self-retrieval MRR.

    Queries are a capped deterministic document sample
    (``id % every == 0 AND id < cap`` — absolute cap, er2's lesson:
    eval cost must not grow with the corpus); each query is the
    source doc's ``n_terms`` RAREST tokens (min df, tie by token) and
    the source doc itself is the one relevant item — the classic
    known-item sanity eval an IR stack runs after every index build.
    Returns ONE row: ``(n_queries, hits_at_1, hits_at_{k},
    mrr_bp)`` with integer MRR@k — per query rr = 10000 DIV rank if
    rank ≤ k else 0, mrr_bp = Σrr DIV n_queries (exact integers, no
    float mean). ``n_queries`` counts sampled docs with ≥ 1 token.

    Scale shape: candidates come from the rarest-term INVERTED
    probe — query terms equi-join the postings relation, so per-query
    work is Σ df(chosen terms), and choosing MINIMUM-df terms makes
    that the smallest possible probe. Ranking windows partition by
    query over those bounded candidate sets; never a corpus-wide
    sort. BM25 weights use ret1's rational idf and order-pinned
    per-(query, doc) fold for cross-engine bit parity.
    """
    tok = (
        fan_out(docs)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    postings = tok.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("_tf")
    ).localCheckpoint(eager=False)
    dl = postings.groupBy(id_col).agg(F.sum("_tf").alias("_dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avgdl"
        ),
    )
    dft = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    qdocs = docs.filter(
        (F.col(id_col) % every == 0) & (F.col(id_col) < cap)
    ).select(F.col(id_col).alias("qid"))
    qtok = postings.join(
        F.broadcast(qdocs), postings[id_col] == F.col("qid")
    ).select("qid", "tok")
    from pyspark.sql import Window

    wq = Window.partitionBy("qid").orderBy("_df", "tok")
    qterms = (
        qtok.join(dft, "tok")
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_terms)
        .select("qid", "tok", "_df")
    )
    cand = qterms.join(postings, "tok").select(
        "qid", F.col(id_col), "tok", "_df", "_tf"
    )
    scored = (
        cand.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_w",
            (
                (
                    F.col("_n_docs").cast("double")
                    - F.col("_df").cast("double")
                    + F.lit(0.5)
                )
                / (F.col("_df").cast("double") + F.lit(0.5))
            )
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
    per_doc = (
        scored.groupBy("qid", id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("tok"), F.col("_w")))
            ).alias("_arr")
        )
        .select(
            "qid",
            id_col,
            F.aggregate(
                "_arr", F.lit(0.0), lambda acc, x: acc + x["_w"]
            ).alias("_score"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("_score"), id_col)
    self_rank = (
        per_doc.withColumn("_rank", F.row_number().over(wr))
        .filter(F.col(id_col) == F.col("qid"))
        .select("qid", "_rank")
    )
    return self_rank.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum((F.col("_rank") == 1).cast("int")).cast("bigint").alias(
            "hits_at_1"
        ),
        F.sum((F.col("_rank") <= k).cast("int")).cast("bigint").alias(
            f"hits_at_{k}"
        ),
        F.sum(
            F.when(
                F.col("_rank") <= k,
                F.expr("CAST(10000 DIV _rank AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("_sum_rr"),
    ).select(
        "n_queries",
        "hits_at_1",
        f"hits_at_{k}",
        F.expr("CAST(_sum_rr DIV n_queries AS BIGINT)").alias("mrr_bp"),
    )
