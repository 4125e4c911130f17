"""The end-to-end curation-run capstone (r10 verdict item 5): ONE
job chaining the dedup→decontaminate→pack stages the registry
previously proved only separately, emitting the published report a
training-data lake posts after a curation pass.

``corpus_curation_run`` tiers (precedence exact > near-dup > eval >
contaminated > kept — the corpus_refresh1 verdict discipline,
applied corpus-wide):

1. exact dedup  — dd1's fingerprint (md5 of normalized text), keep
   the minimum doc_id per fingerprint group;
2. near-dup     — dd9/dd10's MinHash/LSH banding → connected
   components → keep-longest keeper, over the tier-1 survivors;
3. eval holdout — every 50th doc (dc1's split) leaves the training
   corpus; its 8-grams (from ALL eval docs, dropped-or-not) form
   the decontamination reference set;
4. decontaminate — dc1/dc6's broadcast eval-gram in-row probe drops
   survivors sharing any 8-gram with the eval split;
5. pack          — tp1's two-phase prefix-sum packing over the kept
   docs prices the final corpus (tp18's fragmentation cells).

100 TB shape: the documents table is SCANNED ONCE, into a pinned
per-doc artifact relation (fingerprint, token count, minhash
signature columns — the corpus_build3 r6 fusion); every tier is a
join of small drop-lists against that relation, the LSH candidate
join is the only corpus self-join (banded, never all-pairs), the
eval-gram set is a broadcast (benchmarks are MBs by definition), and
the report derives from ONE pinned per-doc verdict relation — the
plan guard in tests/test_scale_ops.py asserts the report plan
contains ZERO FileScans (everything downstream of the two pinned
relations).  Reference parity: the reference's pipeline is
single-stage ETL (src/scrape + src/db); this composite is the
beyond-parity LLM-curation surface mandated by the brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import (
    doc_fingerprint,
    token_count,
)
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _MINHASH_BANDS_SQL,
    _NORM,
    _TOKENS,
    _TOKEN_COUNT,
)

__all__ = ["q_corpus_curation_run"]


def q_corpus_curation_run(spark, sf_dir):
    from enriched_crime_incident_data_pipeline_spark.datapipe.clusters import (
        connected_components,
        dedup_drop_list,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.corpus import (
        PACK_BUDGET,
        pack_assignments,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        bands_from_sigs,
        lsh_candidate_pairs,
        with_minhash_cols,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
        with_contamination_flag,
    )
    from enriched_crime_incident_data_pipeline_spark.operators.parallelism import (
        fan_out,
    )

    # ONE documents scan computes every per-doc artifact any tier
    # needs (fingerprint for exact dedup, minhash signature columns
    # for banding, token count for the keeper policy and packing),
    # then pins — every tier below reads COLUMNS of this relation;
    # the text is tokenized/hashed exactly once. Lazy checkpoint: the
    # first consumer's job materializes the blocks.
    base = (
        with_minhash_cols(
            fan_out(load_table(spark, sf_dir, "documents")).select(
                "doc_id",
                "source",
                "text",
                doc_fingerprint(F.col("text")).alias("fingerprint"),
                token_count(F.col("text")).cast("bigint").alias("n_tokens"),
            )
        )
    ).localCheckpoint(eager=False)

    # tier 1 — exact dedup: keeper = min doc_id per fingerprint.
    # Keeper ids are doc ids, so the survivor filter is one semi-join
    # on doc_id (no fingerprint re-hash downstream).
    k1 = base.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    s1 = base.join(k1.select("doc_id"), "doc_id", "left_semi")

    # tier 2 — near-dup over tier-1 survivors: banding reads the
    # precomputed signature columns; CC resolves families (driver /
    # single-task tier for real near-dup graphs); keep-longest drops.
    members = connected_components(
        lsh_candidate_pairs(bands_from_sigs(s1))
    )
    ndrops = dedup_drop_list(
        members, s1.select(F.col("doc_id").alias("node"), "n_tokens")
    ).select("doc_id")

    # tier 3 — decontamination input: survivors that are not the eval
    # split; the flag is the dc6 in-row broadcast-frozenset probe
    # (eval grams collected from ALL original eval docs)
    s2t = (
        s1.join(ndrops, "doc_id", "left_anti")
        .filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", "text")
    )
    eval_docs = base.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    cids = (
        with_contamination_flag(s2t, eval_docs, n=8)
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )

    # per-doc verdict relation — the run's audit log, pinned once;
    # the whole report derives from it (0 FileScans downstream)
    v = (
        base.select("doc_id", "source", "n_tokens")
        .join(
            k1.select("doc_id").withColumn("_k1", F.lit(1)), "doc_id", "left"
        )
        .join(
            members.select(F.col("node").alias("doc_id"), "cluster_id"),
            "doc_id",
            "left",
        )
        .join(ndrops.withColumn("_nd", F.lit(1)), "doc_id", "left")
        .join(cids.withColumn("_ct", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cluster_id",
            F.when(F.col("_k1").isNull(), F.lit("exact_dup"))
            .when(F.col("_nd") == 1, F.lit("near_dup"))
            .when(F.col("doc_id") % 50 == 0, F.lit("eval_holdout"))
            .when(F.col("_ct") == 1, F.lit("contaminated"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
        .localCheckpoint(eager=True)
    )

    # tier 4 — pack the kept corpus (size_col: text never enters the
    # prefix-sum plan) and fold the tp18 fragmentation cells + token
    # total into ONE 1-row agg, stack-unpivoted (the house idiom)
    pa = pack_assignments(
        v.filter(F.col("verdict") == "kept").select("doc_id", "n_tokens"),
        size_col="n_tokens",
    )
    crossing = (
        F.col("start_offset") + F.col("n_tokens")
        > (F.col("pack_id") + 1) * PACK_BUDGET
    )
    pcells = (
        pa.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("bigint").alias("_kn"),
            F.count_distinct("pack_id").cast("bigint").alias("_np"),
            F.coalesce(F.sum(crossing.cast("int")), F.lit(0))
            .cast("bigint")
            .alias("_ncross"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("_ktok"),
        )
        .select(
            F.expr(
                "stack(4,"
                " 'n_packs', '', _np,"
                " 'docs_crossing', '', _ncross,"
                " 'pack_crossing_bp', '', CAST(CASE WHEN _kn = 0 THEN 0"
                "   ELSE (_ncross * 10000) DIV _kn END AS BIGINT),"
                " 'kept_tokens', '', _ktok"
                ") AS (metric, dim, value)"
            )
        )
    )

    docs_per_verdict = v.groupBy("verdict").agg(
        F.count(F.lit(1)).cast("bigint").alias("value")
    ).select(
        F.lit("docs").alias("metric"),
        F.col("verdict").alias("dim"),
        "value",
    )
    contam_by_source = (
        v.filter(F.col("verdict") == "contaminated")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
        .select(
            F.lit("contaminated_by_source").alias("metric"),
            F.col("source").alias("dim"),
            "value",
        )
    )
    fam = (
        v.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .groupBy("_sz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("value"))
        .select(
            F.lit("dup_family_size").alias("metric"),
            F.col("_sz").cast("string").alias("dim"),
            "value",
        )
    )
    return (
        docs_per_verdict.unionByName(contam_by_source)
        .unionByName(fam)
        .unionByName(pcells)
    )


QUERIES = {
    "corpus_curation_run": q_corpus_curation_run,
}


def oracles() -> dict[str, str]:
    bands_over_s1 = _MINHASH_BANDS_SQL.replace("FROM documents", "FROM s1")
    return {
        "corpus_curation_run": f"""
            WITH RECURSIVE base AS (
              SELECT doc_id, source, text, md5({_NORM}) AS fp,
                     CAST({_TOKEN_COUNT} AS BIGINT) AS nt
              FROM documents
            ),
            k1 AS (SELECT fp, min(doc_id) AS keep_id FROM base GROUP BY fp),
            s1 AS (
              SELECT b.* FROM base b JOIN k1 ON b.doc_id = k1.keep_id
            ),
            bands AS ({bands_over_s1}),
            pairs AS (
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
              SELECT e.a AS node, r.label FROM edges e
              JOIN reach r ON r.node = e.b
            ),
            cc AS (
              SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
            ),
            sized AS (
              SELECT cc.node, cc.cluster_id, s1.nt
              FROM cc JOIN s1 ON cc.node = s1.doc_id
            ),
            keep2 AS (
              SELECT cluster_id, node AS keeper_id FROM (
                SELECT cluster_id, node,
                       row_number() OVER (PARTITION BY cluster_id
                         ORDER BY nt DESC, node) AS rn
                FROM sized
              ) WHERE rn = 1
            ),
            ndrops AS (
              SELECT s.node AS doc_id FROM sized s
              JOIN keep2 k USING (cluster_id)
              WHERE s.node <> k.keeper_id
            ),
            s2t AS (
              SELECT s1.doc_id, s1.text FROM s1
              WHERE s1.doc_id % 50 <> 0
                AND s1.doc_id NOT IN (SELECT doc_id FROM ndrops)
            ),
            w AS (SELECT doc_id, {_TOKENS} AS toks FROM s2t),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            wev AS (
              SELECT doc_id, {_TOKENS} AS toks FROM base WHERE doc_id % 50 = 0
            ),
            ev AS (
              SELECT DISTINCT
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM wev, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                        AS t(i)
            ),
            cids AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)),
            v AS (
              SELECT b.doc_id, b.source, b.nt, cc.cluster_id,
                     CASE WHEN k1x.keep_id IS NULL THEN 'exact_dup'
                          WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                          WHEN b.doc_id % 50 = 0 THEN 'eval_holdout'
                          WHEN ci.doc_id IS NOT NULL THEN 'contaminated'
                          ELSE 'kept' END AS verdict
              FROM base b
              LEFT JOIN k1 k1x ON b.doc_id = k1x.keep_id
              LEFT JOIN cc ON b.doc_id = cc.node
              LEFT JOIN (SELECT DISTINCT doc_id FROM ndrops) nd
                ON b.doc_id = nd.doc_id
              LEFT JOIN cids ci ON b.doc_id = ci.doc_id
            ),
            kept AS (SELECT doc_id, nt FROM v WHERE verdict = 'kept'),
            o AS (
              SELECT doc_id, nt,
                CAST(coalesce(sum(nt) OVER (
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
              FROM kept
            ),
            pa AS (
              SELECT nt, start_offset,
                     CAST(floor(start_offset / 256.0) AS BIGINT) AS pack_id
              FROM o
            ),
            pcells AS (
              SELECT CAST(count(*) AS BIGINT) AS kn,
                     CAST(count(DISTINCT pack_id) AS BIGINT) AS np,
                     CAST(coalesce(sum(CASE WHEN start_offset + nt >
                          (pack_id + 1) * 256 THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS ncross,
                     CAST(coalesce(sum(nt), 0) AS BIGINT) AS ktok
              FROM pa
            ),
            fam AS (
              SELECT cluster_id, count(*) AS fam_size FROM v
              WHERE cluster_id IS NOT NULL GROUP BY cluster_id
            )
            SELECT 'docs' AS metric, verdict AS dim,
                   CAST(count(*) AS BIGINT) AS value
            FROM v GROUP BY verdict
            UNION ALL
            SELECT 'contaminated_by_source', source,
                   CAST(count(*) AS BIGINT)
            FROM v WHERE verdict = 'contaminated' GROUP BY source
            UNION ALL
            SELECT 'dup_family_size', CAST(fam_size AS VARCHAR),
                   CAST(count(*) AS BIGINT)
            FROM fam GROUP BY fam_size
            UNION ALL SELECT 'n_packs', '', np FROM pcells
            UNION ALL SELECT 'docs_crossing', '', ncross FROM pcells
            UNION ALL SELECT 'pack_crossing_bp', '',
                   CAST(CASE WHEN kn = 0 THEN 0
                        ELSE (ncross * 10000) // kn END AS BIGINT)
            FROM pcells
            UNION ALL SELECT 'kept_tokens', '', ktok FROM pcells
""",
    }
