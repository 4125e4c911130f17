"""Decontamination family (dc*): n-gram/semantic/cross-snapshot/Bloom, in-row flags, span scrubs.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import hash32, lsh_candidate_pairs, minhash_bands
from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import cross_snapshot_new_docs, ngram_contamination
from enriched_crime_incident_data_pipeline_spark.functions.text import doc_fingerprint, tokens
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _BLOOM_GPOS,
    _BLOOM_GPOS_DOC,
    _DC7_BLOOM_SQL,
    _HASH32,
    _MINHASH_BANDS_SQL,
    _NORM,
    _TOKENS,
)




def q_dc5_semantic_decontaminate(spark, sf_dir):
    # embedding-space decontamination: the paraphrase-robust
    # complement of dc1's n-gram probe — eval vectors broadcast,
    # train side scores map-only, threshold shared with dd6
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(emb, eval_mod=50, threshold=0.4)


def q_dc3_leakage_safe_split(spark, sf_dir):
    # leakage-safe train/eval split: assign whole NEAR-DUP CLUSTERS
    # (LSH pairs → connected components; singletons are their own
    # cluster) to a split by cluster-id hash, so no near-duplicate
    # pair ever straddles train/eval — the eval-contamination failure
    # a doc-level random split cannot prevent
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    cl = dup_clusters(docs, lsh_candidate_pairs(minhash_bands(docs)))
    split = F.when(
        F.pmod(
            hash32(
                F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))
            ),
            F.lit(10),
        )
        < 9,
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return cl.select("doc_id", "cluster_id", split.alias("split"))


def q_dc9_contamination_by_source(spark, sf_dir):
    # the leak-attribution report a curation team publishes from dc1's
    # per-doc flags: per PROVIDER, training docs, contaminated docs,
    # and the rate in bp — "which source leaks eval data" is the
    # actionable form of the audit (you fix a crawler, not a doc).
    # dc1's machinery verbatim (eval grams broadcast, corpus never
    # self-joins) + one source-domain groupBy on the join-back.
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    rep = ngram_contamination(train, eval_docs, n=8)
    return (
        train.select("doc_id", "source")
        .join(rep.select("doc_id", "contaminated"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("contaminated").cast("bigint").alias("n_contaminated"),
        )
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            F.expr(
                "CAST((n_contaminated * 10000) DIV n_docs AS BIGINT)"
            ).alias("contamination_bp"),
        )
    )


def q_dc10_gram_length_curve(spark, sf_dir):
    # the GRAM-LENGTH sizing artifact for decontamination (r10; the
    # n in dc1's "8-gram" is a recall/precision knob nobody should
    # set unmeasured): contamination rate at n = 4 / 8 / 16 — short
    # grams over-flag (common phrases), long grams under-flag (only
    # verbatim spans). ONE tokenization of the corpus (pinned toks
    # relation; doc_ngrams' lambda-hoisting discipline), then each n
    # is a map-only gram derivation + broadcast eval-gram semi-join
    # (dc1's asymmetry: eval benchmarks are MBs) -> three 1-row
    # cells crossJoined and stacked to the 3-row curve. Exact
    # integers.
    from enriched_crime_incident_data_pipeline_spark.operators.parallelism import (
        fan_out,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        fan_out(docs)
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .localCheckpoint(eager=False)
    )
    ev = toks.filter(F.col("doc_id") % 50 == 0)
    tr = toks.filter(F.col("doc_id") % 50 != 0)
    n_train = tr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_docs")
    )
    # NB: the per-n lambda must stay single-parameter — pyspark
    # treats a 2-arg lambda (even with a default) as the
    # (element, index) form and silently passes the INDEX into the
    # second slot; the def closure below is the safe capture
    def _grams(n: int):
        n_sh = F.greatest(F.size(F.col("toks")) - F.lit(n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, n)),
        )

    out = None
    for n in (4, 8, 16):
        grams = _grams(n)
        eg = (
            ev.select(F.explode(F.array_distinct(grams)).alias("gram"))
            .distinct()
        )
        tg = tr.select(
            "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
        )
        egc = eg.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_eval_grams_{n}")
        )
        hit = (
            tg.join(F.broadcast(eg), "gram")
            .select("doc_id")
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_contam_{n}"))
        )
        cell = F.broadcast(egc).crossJoin(F.broadcast(hit))
        out = cell if out is None else out.crossJoin(cell)
    one = n_train.crossJoin(F.broadcast(out))
    return one.select(
        F.expr(
            "stack(3, "
            + ", ".join(
                f"{n}, n_eval_grams_{n}, n_contam_{n}" for n in (4, 8, 16)
            )
            + ") AS (gram_len, n_eval_grams, n_contaminated)"
        ),
        "n_train_docs",
    ).select(
        F.col("gram_len").cast("int").alias("gram_len"),
        "n_eval_grams",
        "n_contaminated",
        "n_train_docs",
        F.expr(
            "CAST((n_contaminated * 10000) DIV n_train_docs AS BIGINT)"
        ).alias("contamination_bp"),
    )


def q_dc1_contamination(spark, sf_dir):
    # train/eval 8-gram decontamination: eval set = every 50th doc;
    # eval-gram set broadcast, corpus never self-joins
    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(train, eval_docs, n=8)


def q_dc6_flag_in_row(spark, sf_dir):
    # in-row decontamination flag (r5): the corpus-build FILTER shape —
    # the eval 8-gram set rides as a broadcast frozenset probed by an
    # Arrow kernel over each row's own grams (O(1) per gram,
    # early-exit per row); no per-gram explode, no groupBy shuffle, no
    # report join-back, so a build's scrub→decontaminate chain stays
    # one linear map stage. Truth value ≡ dc1's `contaminated`.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        with_contamination_flag,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", "source", "text"
    )
    return with_contamination_flag(train, eval_docs, n=8).select(
        "doc_id", "source", "contaminated"
    )


def q_dc8_scrub_spans(spark, sf_dir):
    # surgical decontamination (r5): remove ONLY the tokens covered by
    # an eval-colliding 8-gram and keep the rest of the document — the
    # graduated policy for high-value long docs (vs dc1+filter, which
    # drops the whole doc for one quoted benchmark item). Map-only
    # frozenset kernel building a coverage mask, O(d) per doc.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        scrub_contaminated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    return scrub_contaminated_spans(train, eval_docs, n=8)


def q_dc7_bloom_decontaminate(spark, sf_dir):
    # Bloom-filter decontamination (r5): the production structure for
    # blocklists too large to broadcast exactly — m bits regardless of
    # eval size. The filter rides as ONE packed array<long> bitset
    # (array element_at is O(1) positional access, the JVM answer to
    # the map-column linear-scan trap); probes are map-only k-md5
    # column expressions, no Python, no explode, no shuffle. md5
    # basis ⇒ even the false positives are engine-deterministic and
    # oracle-checked.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        bloom_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    return bloom_decontaminate(train, eval_docs, n=8)


def q_dc4_overlap_fraction(spark, sf_dir):
    # fractional contamination (GPT-3/PaLM-style): share of each
    # training doc's distinct 8-grams found in the eval set — the
    # graduated-policy companion to dc1's boolean flag
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        ngram_overlap_fraction,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return ngram_overlap_fraction(train, eval_docs, n=8)


def q_dc2_cross_snapshot(spark, sf_dir):
    # incremental-corpus dedup: new snapshot (doc_id >= 250) anti-joined
    # against the previous snapshot's content fingerprints
    docs = load_table(spark, sf_dir, "documents")
    with_fp = docs.withColumn("fingerprint", doc_fingerprint(F.col("text")))
    old = with_fp.filter(F.col("doc_id") < 250)
    new = with_fp.filter(F.col("doc_id") >= 250)
    kept = cross_snapshot_new_docs(new, old, "fingerprint")
    return kept.select("doc_id", "fingerprint")

def q_dc11_bloom_exact_agreement(spark, sf_dir):
    # the BLOOM-TRUST audit (r10): sk10 publishes the filter's FPR on
    # synthetic membership probes — this measures it on the REAL
    # decontamination workload, as the agreement cells between dc1's
    # exact broadcast-set verdict and dc7's m-bit Bloom verdict over
    # the same train/eval split. Bloom admits NO false negatives, so
    # the (exact ∧ ¬bloom) cell is structurally empty (pinned by
    # test) and the (¬exact ∧ bloom) cell IS the measured
    # false-positive mass: the documents a Bloom-only pipeline would
    # over-drop, which is exactly the number that decides whether m
    # bits suffice or the exact set must be sharded. Two doc-domain
    # flag relations (each the parent op's own machinery), one
    # primary-key join, one ≤4-cell conditional agg.
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        bloom_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    ex = ngram_contamination(train, eval_docs, n=8).select(
        "doc_id",
        (F.col("contaminated") > 0).alias("exact_contaminated"),
    )
    bl = bloom_decontaminate(train, eval_docs, n=8).select(
        "doc_id",
        (F.col("contaminated") > 0).alias("bloom_contaminated"),
    )
    cells = (
        ex.join(bl, "doc_id")
        .groupBy("exact_contaminated", "bloom_contaminated")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return cells.select(
        "exact_contaminated",
        "bloom_contaminated",
        "n_docs",
        F.expr(
            "CAST((n_docs * 10000) DIV (sum(n_docs) OVER ()) AS BIGINT)"
        ).alias("share_bp"),
    )


QUERIES = {
    "dc11_bloom_exact_agreement": q_dc11_bloom_exact_agreement,
    "dc3_leakage_safe_split": q_dc3_leakage_safe_split,
    "dc5_semantic_decontaminate": q_dc5_semantic_decontaminate,
    "dc1_contamination": q_dc1_contamination,
    "dc9_contamination_by_source": q_dc9_contamination_by_source,
    "dc10_gram_length_curve": q_dc10_gram_length_curve,
    "dc6_flag_in_row": q_dc6_flag_in_row,
    "dc7_bloom_decontaminate": q_dc7_bloom_decontaminate,
    "dc8_scrub_spans": q_dc8_scrub_spans,
    "dc2_cross_snapshot": q_dc2_cross_snapshot,
    "dc4_overlap_fraction": q_dc4_overlap_fraction,
}

def oracles() -> dict[str, str]:
    return {
        "dc5_semantic_decontaminate": """
                    WITH e AS (
                      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                    ),
                    t AS (SELECT vec_id, v FROM e WHERE vec_id % 50 <> 0),
                    ev AS (SELECT vec_id AS eid, v AS evv FROM e
                           WHERE vec_id % 50 = 0),
                    scored AS (
                      SELECT t.vec_id,
                             list_dot_product(t.v, ev.evv)
                               / (sqrt(list_dot_product(t.v, t.v))
                                  * sqrt(list_dot_product(ev.evv, ev.evv))) AS cos
                      FROM t, ev
                    )
                    SELECT vec_id, CAST(count(*) AS INTEGER) AS n_eval_hits,
                           max(cos) AS max_cos
                    FROM scored WHERE cos >= 0.4 GROUP BY vec_id
                """,
        "dc3_leakage_safe_split": f"""
                    WITH RECURSIVE pairs AS (
                      WITH bands AS ({_MINHASH_BANDS_SQL})
                      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                      FROM bands l JOIN bands r
                        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
                      WHERE l.doc_id < r.doc_id
                    ),
                    edges AS (
                      SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
                    ),
                    reach(node, label) AS (
                      SELECT DISTINCT a AS node, a AS label FROM edges
                      UNION
                      SELECT e.a AS node, r.label FROM edges e JOIN reach r ON r.node = e.b
                    ),
                    cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
                    cl AS (
                      SELECT d.doc_id,
                             coalesce(cc.cluster_id, d.doc_id) AS cluster_id
                      FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
                    )
                    SELECT doc_id, cluster_id,
                           CASE WHEN {_HASH32.format(
                               x="'split:' || CAST(cluster_id AS VARCHAR)")} % 10 < 9
                                THEN 'train' ELSE 'eval' END AS split
                    FROM cl
                """,
        "dc10_gram_length_curve": f"""
            WITH
              cell_4 AS (
                WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                g AS (
                  SELECT DISTINCT doc_id,
                         array_to_string(list_slice(toks, i, i + 3), ' ')
                           AS gram
                  FROM w, unnest(generate_series(1,
                           greatest(len(toks) - 3, 1))) AS t(i)
                ),
                ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                hit AS (
                  SELECT DISTINCT g.doc_id
                  FROM g JOIN ev USING (gram)
                  WHERE g.doc_id % 50 <> 0
                )
                SELECT 4 AS gram_len,
                       CAST((SELECT count(*) FROM ev) AS BIGINT)
                         AS n_eval_grams,
                       CAST((SELECT count(*) FROM hit) AS BIGINT)
                         AS n_contaminated
              ),
              cell_8 AS (
                WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                g AS (
                  SELECT DISTINCT doc_id,
                         array_to_string(list_slice(toks, i, i + 7), ' ')
                           AS gram
                  FROM w, unnest(generate_series(1,
                           greatest(len(toks) - 7, 1))) AS t(i)
                ),
                ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                hit AS (
                  SELECT DISTINCT g.doc_id
                  FROM g JOIN ev USING (gram)
                  WHERE g.doc_id % 50 <> 0
                )
                SELECT 8 AS gram_len,
                       CAST((SELECT count(*) FROM ev) AS BIGINT)
                         AS n_eval_grams,
                       CAST((SELECT count(*) FROM hit) AS BIGINT)
                         AS n_contaminated
              ),
              cell_16 AS (
                WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                g AS (
                  SELECT DISTINCT doc_id,
                         array_to_string(list_slice(toks, i, i + 15), ' ')
                           AS gram
                  FROM w, unnest(generate_series(1,
                           greatest(len(toks) - 15, 1))) AS t(i)
                ),
                ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                hit AS (
                  SELECT DISTINCT g.doc_id
                  FROM g JOIN ev USING (gram)
                  WHERE g.doc_id % 50 <> 0
                )
                SELECT 16 AS gram_len,
                       CAST((SELECT count(*) FROM ev) AS BIGINT)
                         AS n_eval_grams,
                       CAST((SELECT count(*) FROM hit) AS BIGINT)
                         AS n_contaminated
              ),
              tn AS (
                SELECT CAST(count(*) AS BIGINT) AS n_train_docs
                FROM documents WHERE doc_id % 50 <> 0
              )
            SELECT CAST(gram_len AS INTEGER) AS gram_len, n_eval_grams,
                   n_contaminated, n_train_docs,
                   CAST((n_contaminated * 10000) // n_train_docs AS BIGINT)
                     AS contamination_bp
            FROM (
              SELECT * FROM cell_4
              UNION ALL SELECT * FROM cell_8
              UNION ALL SELECT * FROM cell_16
            ) CROSS JOIN tn
""",
        "dc9_contamination_by_source": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    g AS (
                      SELECT DISTINCT doc_id,
                             array_to_string(list_slice(toks, i, i + 7), ' ')
                               AS gram
                      FROM w, unnest(generate_series(1,
                               greatest(len(toks) - 7, 1))) AS t(i)
                    ),
                    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                    hit AS (
                      SELECT DISTINCT g.doc_id
                      FROM g JOIN ev USING (gram)
                      WHERE g.doc_id % 50 <> 0
                    ),
                    per AS (
                      SELECT d.source,
                             CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(sum(CASE WHEN h.doc_id IS NULL THEN 0
                                      ELSE 1 END) AS BIGINT)
                               AS n_contaminated
                      FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
                      WHERE d.doc_id % 50 <> 0
                      GROUP BY d.source
                    )
                    SELECT source, n_docs, n_contaminated,
                           CAST((n_contaminated * 10000) // n_docs AS BIGINT)
                             AS contamination_bp
                    FROM per
""",
        "dc11_bloom_exact_agreement": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    g AS MATERIALIZED (
                      SELECT DISTINCT doc_id,
                             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
                      FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                               AS t(i)
                    ),
                    ev AS MATERIALIZED (
                      SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
                    ),
                    shared AS (
                      SELECT g.doc_id, count(*) AS n_shared
                      FROM g JOIN ev USING (gram)
                      WHERE g.doc_id % 50 <> 0
                      GROUP BY g.doc_id
                    ),
                    bits AS (
                      SELECT DISTINCT bit FROM ({_BLOOM_GPOS.format(src="ev")})
                    ),
                    gp AS ({_BLOOM_GPOS_DOC.format(src="g WHERE doc_id % 50 <> 0")}),
                    ghit AS (
                      SELECT gp.doc_id, gp.gram
                      FROM gp LEFT JOIN bits b ON gp.bit = b.bit
                      GROUP BY gp.doc_id, gp.gram
                      HAVING sum(CASE WHEN b.bit IS NULL THEN 1 ELSE 0 END) = 0
                    ),
                    hit AS (SELECT DISTINCT doc_id FROM ghit),
                    fl AS (
                      SELECT d.doc_id,
                             coalesce(s.n_shared, 0) > 0 AS exact_contaminated,
                             h.doc_id IS NOT NULL AS bloom_contaminated
                      FROM documents d
                      LEFT JOIN shared s ON d.doc_id = s.doc_id
                      LEFT JOIN hit h ON d.doc_id = h.doc_id
                      WHERE d.doc_id % 50 <> 0
                    )
                    SELECT exact_contaminated, bloom_contaminated,
                           CAST(count(*) AS BIGINT) AS n_docs,
                           CAST((count(*) * 10000)
                                // (sum(count(*)) OVER ()) AS BIGINT)
                             AS share_bp
                    FROM fl GROUP BY 1, 2
                """,
        "dc1_contamination": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    g AS (
                      SELECT DISTINCT doc_id,
                             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
                      FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                               AS t(i)
                    ),
                    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                    shared AS (
                      SELECT g.doc_id, count(*) AS n_shared
                      FROM g JOIN ev USING (gram)
                      WHERE g.doc_id % 50 <> 0
                      GROUP BY g.doc_id
                    )
                    SELECT d.doc_id,
                           CAST(coalesce(s.n_shared, 0) AS INTEGER) AS n_shared,
                           CAST(CASE WHEN coalesce(s.n_shared, 0) > 0 THEN 1 ELSE 0 END
                                AS INTEGER) AS contaminated
                    FROM documents d LEFT JOIN shared s ON d.doc_id = s.doc_id
                    WHERE d.doc_id % 50 <> 0
                """,
        "dc6_flag_in_row": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    g AS (
                      SELECT DISTINCT doc_id,
                             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
                      FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                               AS t(i)
                    ),
                    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
                    hit AS (
                      SELECT DISTINCT g.doc_id
                      FROM g JOIN ev USING (gram)
                      WHERE g.doc_id % 50 <> 0
                    )
                    SELECT d.doc_id, d.source,
                           CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                                AS INTEGER) AS contaminated
                    FROM documents d LEFT JOIN hit h USING (doc_id)
                    WHERE d.doc_id % 50 <> 0
                """,
        "dc8_scrub_spans": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    gp AS (
                      SELECT doc_id, i,
                             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
                      FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                               AS t(i)
                    ),
                    ev AS (SELECT DISTINCT gram FROM gp WHERE doc_id % 50 = 0),
                    hitpos AS (
                      SELECT gp.doc_id, gp.i FROM gp JOIN ev USING (gram)
                      WHERE gp.doc_id % 50 <> 0
                    ),
                    covered AS (
                      SELECT DISTINCT doc_id, c.j
                      FROM hitpos, LATERAL (
                        SELECT unnest(generate_series(i, i + 7)) AS j
                      ) c
                    ),
                    tok_rows AS (
                      SELECT doc_id, t.j, toks[t.j] AS tok
                      FROM w, unnest(generate_series(1, len(toks))) AS t(j)
                      WHERE doc_id % 50 <> 0
                    )
                    SELECT tr.doc_id,
                           CAST(count(*) AS INTEGER) AS n_tokens,
                           CAST(sum(CASE WHEN c.j IS NULL THEN 0 ELSE 1 END)
                                AS INTEGER) AS n_masked,
                           coalesce(string_agg(tok, ' ' ORDER BY tr.j)
                                    FILTER (WHERE c.j IS NULL), '') AS scrubbed_text
                    FROM tok_rows tr
                    LEFT JOIN covered c ON tr.doc_id = c.doc_id AND tr.j = c.j
                    GROUP BY tr.doc_id
                """,
        "dc7_bloom_decontaminate": _DC7_BLOOM_SQL,
        "dc4_overlap_fraction": f"""
                    WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
                    g AS (
                      SELECT DISTINCT doc_id,
                             array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
                      FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                               AS t(i)
                    ),
                    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
                    SELECT g.doc_id,
                           CAST(count(*) AS INTEGER) AS n_grams,
                           CAST(count(ev.gram) AS INTEGER) AS n_shared,
                           CAST(count(ev.gram) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE) AS overlap_frac
                    FROM g LEFT JOIN ev USING (gram)
                    WHERE g.doc_id % 50 <> 0
                    GROUP BY g.doc_id
                """,
        "dc2_cross_snapshot": f"""
                    WITH fp AS (SELECT doc_id, md5({_NORM}) AS fingerprint
                                FROM documents)
                    SELECT doc_id, fingerprint FROM fp
                    WHERE doc_id >= 250
                      AND fingerprint NOT IN
                          (SELECT fingerprint FROM fp WHERE doc_id < 250)
                """,
    }
