"""Multimodal binary-column family (mm*): media features, metadata, frame sampling, resize plans, perceptual near-dup.

Split out of registry.py (r6); function bodies unchanged. ``QUERIES``
and ``ORACLES`` are assembled into the full registry by
``registry/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import extract_byte_histograms, extract_features
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table

from enriched_crime_incident_data_pipeline_spark.registry._shared import (
    _documents_as_media,
)




def q_mm10_dhash_band_skew(spark, sf_dir):
    # the BLOCK-SKEW profile for the media family (r10; completes the
    # set — ret9 prices the term index, er5 the ER blocks, gr15 the
    # graph wedges, geo3 the spatial grid, this the dHash bands):
    # per pigeonhole band, the bucket-occupancy log2 histogram with
    # each bucket's share of the candidate-pair sum Σ s·(s−1)/2 —
    # the cost mm5/mm6's band equi-join actually pays, and the
    # number that says when a hot-hash cap (mm7's discipline) is
    # needed. One Arrow signature pass, one (band_idx, band_val)
    # groupBy, a ≤4×64-row histogram; share windows run over the
    # histogram only, partitioned by band.
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        simhash_bands,
    )
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        dhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = dhash_signatures(
        _documents_as_media(docs), "media_id"
    ).withColumnRenamed("dhash", "simhash")
    bands = simhash_bands(sig, "media_id")
    sizes = bands.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    hist = sizes.select(
        F.col("band_idx").cast("int").alias("band_idx"),
        F.length(F.conv(F.col("s").cast("string"), 10, 2))
        .cast("int")
        .alias("bucket"),
        "s",
    ).groupBy("band_idx", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("s").cast("bigint").alias("n_media"),
        F.sum(F.expr("s * (s - 1) DIV 2")).cast("bigint").alias(
            "cand_pairs"
        ),
    )
    return hist.select(
        "band_idx",
        "bucket",
        "n_buckets",
        "n_media",
        "cand_pairs",
        F.expr(
            "CAST(CASE WHEN sum(cand_pairs) OVER"
            " (PARTITION BY band_idx) = 0 THEN 0"
            " ELSE (cand_pairs * 10000) DIV"
            " (sum(cand_pairs) OVER (PARTITION BY band_idx)) END"
            " AS BIGINT)"
        ).alias("pair_share_bp"),
    )


def q_mm1_media_features(spark, sf_dir):
    # Arrow-batched mapInPandas feature extraction over binary media.
    # The driver-compared face is the exact integer byte-histogram
    # projected to a JSON string (canonicalizable scalar; bit-equal
    # SQL twin); the normalized float feature from extract_features is
    # unit-pinned in tests/test_multimodal_streaming.py
    docs = load_table(spark, sf_dir, "documents")
    hist = extract_byte_histograms(_documents_as_media(docs))
    return hist.select(
        "media_id",
        "kind",
        "n_bytes",
        F.to_json("hist").alias("feature_json"),
    )


def q_mm4_resize_plan(spark, sf_dir):
    # thumbnail-fit dimensions through the Arrow mapInPandas path —
    # integer math gives the UDF stage an exact SQL twin
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        resize_thumbnails,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs).select(
        "media_id",
        "kind",
        "content",
        (320 + (F.col("media_id") % 7) * 160).cast("int").alias("width"),
        (240 + (F.col("media_id") % 5) * 120).cast("int").alias("height"),
    )
    return resize_thumbnails(media, max_side=224)


def q_mm8_exact_media_dedup(spark, sf_dir):
    # the FIRST pass every media lake runs, before any perceptual
    # matching (mm5/mm6/mm7 are the near-dup passes): exact payload
    # dedup by (md5(content), length) — byte-identical copies
    # collapse regardless of filename/metadata. Hash computed in the
    # scan task (payload bytes never shuffle — only the 16-byte
    # digest + length do), one hash-domain groupBy, keeper = min id.
    # Returns only families with copies (n_copies ≥ 2); the digest
    # is published so the row is re-checkable.
    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs)
    return (
        media.select(
            "media_id",
            F.md5("content").alias("content_md5"),
            F.length("content").cast("bigint").alias("n_bytes"),
        )
        .groupBy("content_md5", "n_bytes")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").alias("keeper_id"),
        )
        .filter(F.col("n_copies") >= 2)
    )


def q_mm7_frame_match(spark, sf_dir):
    # video-level near-dup via the frame-fingerprint inverted index —
    # the CBVR shape (per-frame dHash, exact equality join, hot-hash
    # cap, pairs sharing >= 2 distinct frame hashes). Frame decode is
    # the byte-slice stand-in behind the same codec seam as mm5; the
    # slicing schedule, fold, postings dedup, skew cap, and the
    # pair-count join are the real algorithm. See
    # datapipe/multimodal.py:frame_match_pairs.
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        frame_match_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return frame_match_pairs(_documents_as_media(docs))


def q_mm5_phash_neardup(spark, sf_dir):
    # perceptual (dHash) image near-dup pairs over binary media:
    # Arrow-kernel signatures, 4x16-bit pigeonhole band candidate
    # join (complete for Hamming<=3), exact bit_count(xor) verify —
    # the image-side twin of dd8's text SimHash dedup
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return phash_near_dup_pairs(_documents_as_media(docs), max_hamming=3)


def q_mm6_phash_threshold_curve(spark, sf_dir):
    # the perceptual-dedup tuning artifact (dd23 for images, ss18
    # for vectors — the threshold curve the rollout is decided on):
    # dup pair count + media affected at every Hamming cutoff
    # 0..3, ALL from ONE banded candidate relation (complete for
    # <=3 by the 4-band pigeonhole, lazily checkpointed for the 4
    # prefix consumers). Each curve point is a conditional
    # aggregate over the candidate-pair relation, never the media
    # corpus.
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        phash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = phash_near_dup_pairs(
        _documents_as_media(docs), max_hamming=3
    ).localCheckpoint(eager=False)
    outs = []
    for h in range(4):
        surv = pairs.filter(F.col("hamming") <= h)
        media = surv.select(
            F.explode(F.array("media_a", "media_b")).alias("m")
        ).agg(F.countDistinct("m").cast("bigint").alias("media_affected"))
        outs.append(
            surv.agg(
                F.lit(h).cast("int").alias("max_hamming"),
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            ).crossJoin(F.broadcast(media))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_mm3_frame_sample(spark, sf_dir):
    # frame-sampling fan-out over video metadata (decode stays a stub;
    # the offset explosion is pure relational work)
    from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
        sample_frame_offsets,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
    return sample_frame_offsets(media, step_ms=1000)


def q_mm9_payload_size_profile(spark, sf_dir):
    # the media STORAGE-LAYOUT audit (r10): payload-size distribution
    # as a log2-bucket histogram with byte-mass shares — the artifact
    # that decides row-group targets and small-file compaction for a
    # 100 TB binary lake (a long tail of tiny payloads wastes footer/
    # metadata overhead; a few huge ones break row-group caps).
    # Bucket index = bit-length of the byte count (pure integer,
    # ts10's idiom, no log()); ONE metadata-only pass — the length()
    # runs in the scan task, payload bytes never shuffle (mm8's
    # discipline), then a <=64-row histogram groupBy; the share
    # windows run over the bucket domain only.
    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs)
    sized = media.select(
        F.length("content").cast("bigint").alias("nb")
    ).select(
        F.length(F.bin(F.col("nb"))).cast("int").alias("bucket"), "nb"
    )
    hist = sized.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_media"),
        F.sum("nb").cast("bigint").alias("total_bytes"),
    )
    return hist.select(
        "bucket",
        "n_media",
        "total_bytes",
        F.expr(
            "CAST((total_bytes * 10000) DIV (sum(total_bytes) OVER ())"
            " AS BIGINT)"
        ).alias("bytes_share_bp"),
        F.expr(
            "CAST((n_media * 10000) DIV (sum(n_media) OVER ())"
            " AS BIGINT)"
        ).alias("media_share_bp"),
    )


def q_mm2_media_meta(spark, sf_dir):
    # binary-column metadata path (byte length) — SQL-expressible twin
    docs = load_table(spark, sf_dir, "documents")
    media = _documents_as_media(docs)
    return media.select(
        "media_id", "kind", F.length("content").cast("bigint").alias("n_bytes")
    )

QUERIES = {
    "mm1_media_features": q_mm1_media_features,
    "mm2_media_meta": q_mm2_media_meta,
    "mm9_payload_size_profile": q_mm9_payload_size_profile,
    "mm3_frame_sample": q_mm3_frame_sample,
    "mm4_resize_plan": q_mm4_resize_plan,
    "mm5_phash_neardup": q_mm5_phash_neardup,
    "mm10_dhash_band_skew": q_mm10_dhash_band_skew,
    "mm7_frame_match": q_mm7_frame_match,
    "mm8_exact_media_dedup": q_mm8_exact_media_dedup,
    "mm6_phash_threshold_curve": q_mm6_phash_threshold_curve,
}

def oracles() -> dict[str, str]:
    return {
        "mm9_payload_size_profile": """
            WITH sized AS (
              SELECT CAST(length(bin(octet_length(encode(text))))
                       AS INTEGER) AS bucket,
                     CAST(octet_length(encode(text)) AS BIGINT) AS nb
              FROM documents
            ),
            hist AS (
              SELECT bucket,
                     CAST(count(*) AS BIGINT) AS n_media,
                     CAST(sum(nb) AS BIGINT) AS total_bytes
              FROM sized GROUP BY bucket
            )
            SELECT bucket, n_media, total_bytes,
                   CAST((total_bytes * 10000)
                        // (sum(total_bytes) OVER ()) AS BIGINT)
                     AS bytes_share_bp,
                   CAST((n_media * 10000)
                        // (sum(n_media) OVER ()) AS BIGINT)
                     AS media_share_bp
            FROM hist
""",
        "mm1_media_features": """
                    WITH hx AS (
                      SELECT doc_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                    ),
                    pos AS (
                      SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
                    ),
                    sums AS (
                      SELECT doc_id, i % 8 AS bucket,
                             CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                                      ::INTEGER) AS BIGINT) AS s
                      FROM pos GROUP BY doc_id, i % 8
                    ),
                    grid AS (
                      SELECT d.doc_id, g.bucket
                      FROM documents d
                      CROSS JOIN (SELECT unnest(range(8)) AS bucket) g
                    ),
                    hist AS (
                      SELECT grid.doc_id, grid.bucket, COALESCE(sums.s, 0) AS s
                      FROM grid LEFT JOIN sums
                        ON grid.doc_id = sums.doc_id AND grid.bucket = sums.bucket
                    )
                    SELECT d.doc_id AS media_id, 'image' AS kind,
                           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
                           '[' || string_agg(CAST(h.s AS VARCHAR), ',' ORDER BY h.bucket)
                               || ']' AS feature_json
                    FROM documents d JOIN hist h ON d.doc_id = h.doc_id
                    GROUP BY d.doc_id, d.text
                """,
        "mm2_media_meta": """
                    SELECT doc_id AS media_id, 'image' AS kind,
                           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                    FROM documents
                """,
        "mm6_phash_threshold_curve": """
                    WITH hx AS (
                      SELECT doc_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                    ),
                    pos AS (
                      SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
                    ),
                    cellsum AS (
                      SELECT doc_id, CAST(i % 72 AS INTEGER) AS k,
                             CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                                      ::INTEGER) AS BIGINT) AS s
                      FROM pos GROUP BY doc_id, i % 72
                    ),
                    grid AS (
                      SELECT d.doc_id, CAST(g.k AS INTEGER) AS k
                      FROM documents d
                      CROSS JOIN (SELECT unnest(range(72)) AS k) g
                    ),
                    cells AS (
                      SELECT grid.doc_id, grid.k, COALESCE(cellsum.s, 0) AS s
                      FROM grid LEFT JOIN cellsum
                        ON grid.doc_id = cellsum.doc_id AND grid.k = cellsum.k
                    ),
                    bits AS (
                      -- dHash bit j = r*8 + c: grid cell (r*9+c) > (r*9+c+1)
                      SELECT a.doc_id,
                             CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                             CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
                      FROM cells a JOIN cells b
                        ON a.doc_id = b.doc_id AND b.k = a.k + 1
                      WHERE a.k % 9 <> 8
                    ),
                    bands AS (
                      SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                             CAST(sum(CAST(bit AS BIGINT)
                                      * (1::BIGINT << (j % 16))) AS BIGINT) AS band_val
                      FROM bits GROUP BY doc_id, j // 16
                    ),
                    cand AS (
                      SELECT DISTINCT l.doc_id AS media_a, r.doc_id AS media_b
                      FROM bands l JOIN bands r
                        ON l.band_idx = r.band_idx AND l.band_val = r.band_val
                       AND l.doc_id < r.doc_id
                    ),
                    ham AS (
                      SELECT c.media_a, c.media_b,
                             CAST(sum(CASE WHEN ba.bit <> bb.bit
                                      THEN 1 ELSE 0 END) AS INTEGER) AS hamming
                      FROM cand c
                      JOIN bits ba ON ba.doc_id = c.media_a
                      JOIN bits bb ON bb.doc_id = c.media_b AND bb.j = ba.j
                      GROUP BY c.media_a, c.media_b
                    )
                    SELECT CAST(0 AS INTEGER) AS max_hamming,
                           CAST(count(*) AS BIGINT) AS n_pairs,
                           CAST((SELECT count(DISTINCT m) FROM (
                              SELECT media_a AS m FROM ham WHERE hamming <= 0
                              UNION ALL
                              SELECT media_b FROM ham WHERE hamming <= 0))
                             AS BIGINT) AS media_affected
                    FROM ham WHERE hamming <= 0
                    UNION ALL
                    SELECT CAST(1 AS INTEGER) AS max_hamming,
                           CAST(count(*) AS BIGINT) AS n_pairs,
                           CAST((SELECT count(DISTINCT m) FROM (
                              SELECT media_a AS m FROM ham WHERE hamming <= 1
                              UNION ALL
                              SELECT media_b FROM ham WHERE hamming <= 1))
                             AS BIGINT) AS media_affected
                    FROM ham WHERE hamming <= 1
                    UNION ALL
                    SELECT CAST(2 AS INTEGER) AS max_hamming,
                           CAST(count(*) AS BIGINT) AS n_pairs,
                           CAST((SELECT count(DISTINCT m) FROM (
                              SELECT media_a AS m FROM ham WHERE hamming <= 2
                              UNION ALL
                              SELECT media_b FROM ham WHERE hamming <= 2))
                             AS BIGINT) AS media_affected
                    FROM ham WHERE hamming <= 2
                    UNION ALL
                    SELECT CAST(3 AS INTEGER) AS max_hamming,
                           CAST(count(*) AS BIGINT) AS n_pairs,
                           CAST((SELECT count(DISTINCT m) FROM (
                              SELECT media_a AS m FROM ham WHERE hamming <= 3
                              UNION ALL
                              SELECT media_b FROM ham WHERE hamming <= 3))
                             AS BIGINT) AS media_affected
                    FROM ham WHERE hamming <= 3
                """,
        "mm8_exact_media_dedup": """
            SELECT md5(text) AS content_md5,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(min(doc_id) AS BIGINT) AS keeper_id
            FROM documents
            GROUP BY 1, 2 HAVING count(*) >= 2
""",
        "mm7_frame_match": """
                    WITH hx AS (
                      SELECT doc_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents WHERE octet_length(encode(text)) > 0
                    ),
                    pos AS (
                      SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
                    ),
                    cellsum AS (
                      SELECT doc_id, CAST(i // 96 AS INTEGER) AS f,
                             CAST((i % 96) % 72 AS INTEGER) AS k,
                             CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                                      ::INTEGER) AS BIGINT) AS s
                      FROM pos GROUP BY doc_id, i // 96, (i % 96) % 72
                    ),
                    frames AS (SELECT DISTINCT doc_id, f FROM cellsum),
                    grid AS (
                      SELECT frames.doc_id, frames.f, CAST(g.k AS INTEGER) AS k
                      FROM frames
                      CROSS JOIN (SELECT unnest(range(72)) AS k) g
                    ),
                    cells AS (
                      SELECT grid.doc_id, grid.f, grid.k,
                             COALESCE(cellsum.s, 0) AS s
                      FROM grid LEFT JOIN cellsum
                        ON grid.doc_id = cellsum.doc_id
                       AND grid.f = cellsum.f AND grid.k = cellsum.k
                    ),
                    bits AS (
                      SELECT a.doc_id, a.f,
                             CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                             CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
                      FROM cells a JOIN cells b
                        ON a.doc_id = b.doc_id AND a.f = b.f AND b.k = a.k + 1
                      WHERE a.k % 9 <> 8
                    ),
                    fh AS (
                      -- bit 63 enters as the signed-long minimum (two's
                      -- complement), matching the kernel's uint64->int64 view
                      SELECT doc_id, f,
                             CAST(sum(CAST(bit AS BIGINT)
                                      * (CASE WHEN j = 63
                                         THEN -9223372036854775807 - 1
                                         ELSE (1::BIGINT << j) END))
                               AS BIGINT) AS fhash
                      FROM bits GROUP BY doc_id, f
                    ),
                    postings AS (SELECT DISTINCT doc_id, fhash FROM fh),
                    hot AS (
                      SELECT fhash FROM (
                        SELECT fhash, count(*) AS nm FROM postings GROUP BY fhash
                      ) WHERE nm > 64
                    ),
                    kept AS (
                      SELECT doc_id, fhash FROM postings
                      WHERE fhash NOT IN (SELECT fhash FROM hot)
                    )
                    SELECT a.doc_id AS media_a, b.doc_id AS media_b,
                           CAST(count(*) AS BIGINT) AS n_shared
                    FROM kept a JOIN kept b
                      ON a.fhash = b.fhash AND a.doc_id < b.doc_id
                    GROUP BY a.doc_id, b.doc_id
                    HAVING count(*) >= 2
                """,
        "mm10_dhash_band_skew": """
                    WITH hx AS (
                      SELECT doc_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                    ),
                    pos AS (
                      SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
                    ),
                    cellsum AS (
                      SELECT doc_id, CAST(i % 72 AS INTEGER) AS k,
                             CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                                      ::INTEGER) AS BIGINT) AS s
                      FROM pos GROUP BY doc_id, i % 72
                    ),
                    grid AS (
                      SELECT d.doc_id, CAST(g.k AS INTEGER) AS k
                      FROM documents d
                      CROSS JOIN (SELECT unnest(range(72)) AS k) g
                    ),
                    cells AS (
                      SELECT grid.doc_id, grid.k, COALESCE(cellsum.s, 0) AS s
                      FROM grid LEFT JOIN cellsum
                        ON grid.doc_id = cellsum.doc_id AND grid.k = cellsum.k
                    ),
                    bits AS (
                      SELECT a.doc_id,
                             CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                             CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
                      FROM cells a JOIN cells b
                        ON a.doc_id = b.doc_id AND b.k = a.k + 1
                      WHERE a.k % 9 <> 8
                    ),
                    bands AS (
                      SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                             CAST(sum(CAST(bit AS BIGINT)
                                      * (1::BIGINT << (j % 16))) AS BIGINT) AS band_val
                      FROM bits GROUP BY doc_id, j // 16
                    ),
                    sizes AS (
                      SELECT band_idx, band_val,
                             CAST(count(*) AS BIGINT) AS s
                      FROM bands GROUP BY 1, 2
                    ),
                    hist AS (
                      SELECT band_idx,
                             CAST(length(bin(s)) AS INTEGER) AS bucket,
                             CAST(count(*) AS BIGINT) AS n_buckets,
                             CAST(sum(s) AS BIGINT) AS n_media,
                             CAST(sum(s * (s - 1) // 2) AS BIGINT)
                               AS cand_pairs
                      FROM sizes GROUP BY 1, 2
                    )
                    SELECT band_idx, bucket, n_buckets, n_media, cand_pairs,
                           CAST(CASE WHEN sum(cand_pairs) OVER
                                  (PARTITION BY band_idx) = 0 THEN 0
                                ELSE (cand_pairs * 10000)
                                     // (sum(cand_pairs) OVER
                                         (PARTITION BY band_idx)) END
                             AS BIGINT) AS pair_share_bp
                    FROM hist
                """,
        "mm5_phash_neardup": """
                    WITH hx AS (
                      SELECT doc_id, hex(encode(text)) AS h,
                             octet_length(encode(text)) AS nb
                      FROM documents
                    ),
                    pos AS (
                      SELECT doc_id, h, unnest(range(nb)) AS i FROM hx
                    ),
                    cellsum AS (
                      SELECT doc_id, CAST(i % 72 AS INTEGER) AS k,
                             CAST(sum(('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2))
                                      ::INTEGER) AS BIGINT) AS s
                      FROM pos GROUP BY doc_id, i % 72
                    ),
                    grid AS (
                      SELECT d.doc_id, CAST(g.k AS INTEGER) AS k
                      FROM documents d
                      CROSS JOIN (SELECT unnest(range(72)) AS k) g
                    ),
                    cells AS (
                      SELECT grid.doc_id, grid.k, COALESCE(cellsum.s, 0) AS s
                      FROM grid LEFT JOIN cellsum
                        ON grid.doc_id = cellsum.doc_id AND grid.k = cellsum.k
                    ),
                    bits AS (
                      -- dHash bit j = r*8 + c: grid cell (r*9+c) > (r*9+c+1)
                      SELECT a.doc_id,
                             CAST((a.k // 9) * 8 + (a.k % 9) AS INTEGER) AS j,
                             CASE WHEN a.s > b.s THEN 1 ELSE 0 END AS bit
                      FROM cells a JOIN cells b
                        ON a.doc_id = b.doc_id AND b.k = a.k + 1
                      WHERE a.k % 9 <> 8
                    ),
                    bands AS (
                      SELECT doc_id, CAST(j // 16 AS INTEGER) AS band_idx,
                             CAST(sum(CAST(bit AS BIGINT)
                                      * (1::BIGINT << (j % 16))) AS BIGINT) AS band_val
                      FROM bits GROUP BY doc_id, j // 16
                    ),
                    cand AS (
                      SELECT DISTINCT l.doc_id AS media_a, r.doc_id AS media_b
                      FROM bands l JOIN bands r
                        ON l.band_idx = r.band_idx AND l.band_val = r.band_val
                       AND l.doc_id < r.doc_id
                    ),
                    ham AS (
                      SELECT c.media_a, c.media_b,
                             CAST(sum(CASE WHEN ba.bit <> bb.bit
                                      THEN 1 ELSE 0 END) AS INTEGER) AS hamming
                      FROM cand c
                      JOIN bits ba ON ba.doc_id = c.media_a
                      JOIN bits bb ON bb.doc_id = c.media_b AND bb.j = ba.j
                      GROUP BY c.media_a, c.media_b
                    )
                    SELECT media_a, media_b, hamming FROM ham WHERE hamming <= 3
                """,
        "mm3_frame_sample": """
                    SELECT doc_id AS media_id,
                           CAST(g.i AS INTEGER) AS frame_idx,
                           CAST(g.i * 1000 AS INTEGER) AS offset_ms
                    FROM documents,
                    LATERAL (
                      SELECT unnest(generate_series(
                        0, CAST(ceil(CAST(n_chars * 10 AS DOUBLE) / 1000) AS BIGINT) - 1
                      )) AS i
                    ) g
                    WHERE n_chars * 10 > 0
                """,
        "mm4_resize_plan": """
                    WITH m AS (
                      SELECT doc_id AS media_id,
                             CAST(320 + (doc_id % 7) * 160 AS BIGINT) AS w,
                             CAST(240 + (doc_id % 5) * 120 AS BIGINT) AS h,
                             encode(text) AS content
                      FROM documents
                    )
                    SELECT media_id,
                           CAST(w AS INTEGER) AS width,
                           CAST(h AS INTEGER) AS height,
                           CAST((w * 224) // greatest(w, h) AS INTEGER) AS new_width,
                           CAST((h * 224) // greatest(w, h) AS INTEGER) AS new_height,
                           CAST(octet_length(content) AS BIGINT) AS n_bytes
                    FROM m
                """,
    }
