"""Shared helpers, SQL fragments, and constants for the query
registry families (split out of the monolithic registry.py in r6).
Every constant/helper keeps its original definition order.
"""


from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    NUM_HASHES,
    embedding_near_dup_pairs,
    exact_duplicate_groups,
    hash32,
    lsh_candidate_pairs,
    minhash_bands,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.multimodal import (
    extract_byte_histograms,
    extract_features,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.similarity import (
    brute_force_neighbors,
    ivf_assignments,
    ivf_topk_neighbors,
)
from enriched_crime_incident_data_pipeline_spark.enrich.geocode import (
    geocode_misses,
    with_coordinates,
)
from enriched_crime_incident_data_pipeline_spark.enrich.sides import (
    with_side_of_town,
)
from enriched_crime_incident_data_pipeline_spark.enrich.weather import with_weather
from enriched_crime_incident_data_pipeline_spark.functions.geography import (
    side_of_town_col,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
    cross_snapshot_new_docs,
    ngram_contamination,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.sketch import (
    BLOOM_K,
    BLOOM_M,
    CMS_D,
    CMS_W,
    bloom_build,
    bloom_probe,
    cms_counters,
    cms_estimates,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.tfidf import (
    tfidf_top_terms,
)
from enriched_crime_incident_data_pipeline_spark.functions.text import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    pii_counts,
    quality_features,
    repetition_features,
    scrub_pii,
    token_count,
    tokens,
    word_shingles,
)
from enriched_crime_incident_data_pipeline_spark.operators.dedup import (
    dedup_by_key,
    idempotent_append,
)
from enriched_crime_incident_data_pipeline_spark.operators.derive import to_silver
from enriched_crime_incident_data_pipeline_spark.operators.emsstat import (
    propagate_emsstat_selfjoin,
)
from enriched_crime_incident_data_pipeline_spark.operators.health import (
    null_count_health,
)
from enriched_crime_incident_data_pipeline_spark.operators.ranks import (
    frequency_rank_table,
    with_frequency_rank,
)
from enriched_crime_incident_data_pipeline_spark.plans.events_adapter import (
    events_as_incidents_raw,
    synthetic_location_dim,
    synthetic_weather_hourly,
)
from enriched_crime_incident_data_pipeline_spark.sources.catalog import load_table
from enriched_crime_incident_data_pipeline_spark.sources.urls import (
    classify_report_urls,
)


QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# shared DuckDB fragments for the events→incidents adapter
# (mirrors plans/events_adapter.py expression-for-expression)
# ---------------------------------------------------------------------------

_RAW = """
    SELECT strftime(ts, '%-m/%-d/%Y %-H:%M') AS datetime_str,
           CAST(event_id AS VARCHAR) AS incident_num,
           'BLK ' || CAST(user_id % 40 AS VARCHAR) || ' MAIN ST' AS location,
           upper(event_type) AS nature,
           CASE WHEN event_type = 'error' THEN 'EMSSTAT' ELSE 'OK0140200' END
             AS incident_ori
    FROM events
"""

_SILVER = f"""
    SELECT incident_num,
           strptime(datetime_str, '%-m/%-d/%Y %-H:%M') AS incident_ts,
           CAST(dayofweek(strptime(datetime_str, '%-m/%-d/%Y %-H:%M')) + 1
                AS INTEGER) AS day_of_week,
           CAST(hour(strptime(datetime_str, '%-m/%-d/%Y %-H:%M'))
                AS INTEGER) AS time_of_day,
           location, nature,
           CASE WHEN incident_ori = 'EMSSTAT' THEN 1 ELSE 0 END AS emsstat
    FROM ({_RAW})
"""

_DEDUPED = f"""
    SELECT * FROM ({_SILVER})
    QUALIFY row_number() OVER (PARTITION BY incident_num ORDER BY incident_num) = 1
"""

_LOCDIM = """
    SELECT 'BLK ' || CAST(m AS VARCHAR) || ' MAIN ST' AS loc,
           35.2226 + CAST(m - 20 AS DOUBLE) * 0.01 AS latitude,
           -97.4395 + CAST((m * 7) % 40 - 20 AS DOUBLE) * 0.0125 AS longitude
    FROM (SELECT DISTINCT user_id % 40 AS m FROM events)
"""

_SIDE_EXPR = """
    CASE WHEN latitude IS NOT NULL AND longitude IS NOT NULL THEN
      (['N','NE','E','SE','S','SW','W','NW'])[
        CAST(floor(
          (((degrees(atan2(
              cos(radians(latitude)) * sin(radians(longitude) - radians(-97.4395)),
              cos(radians(35.2226)) * sin(radians(latitude))
                - sin(radians(35.2226)) * cos(radians(latitude))
                  * cos(radians(longitude) - radians(-97.4395))
            )) + 360.0) % 360.0 + 22.5) % 360.0) / 45.0
        ) AS INTEGER) + 1]
    END
"""


def _silver_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedup_by_key(to_silver(events_as_incidents_raw(events)), "incident_num")


_FLAGSHIP_SQL = f"""
WITH deduped AS ({_DEDUPED}),
ems AS (
  SELECT incident_num, incident_ts, day_of_week, time_of_day, location, nature,
         CAST(max(emsstat) OVER (PARTITION BY incident_ts, location) AS INTEGER)
           AS emsstat
  FROM deduped
),
locrank AS (
  SELECT location,
         CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS location_rank
  FROM deduped GROUP BY location
),
natrank AS (
  SELECT nature,
         CAST(rank() OVER (ORDER BY count(*) DESC) AS INTEGER) AS incident_rank
  FROM deduped GROUP BY nature
),
locdim AS ({_LOCDIM}),
coords AS (
  SELECT e.*, d.latitude, d.longitude
  FROM ems e LEFT JOIN locdim d ON e.location = d.loc
),
sided AS (
  SELECT *, {_SIDE_EXPR} AS side_of_town FROM coords
),
wh AS (
  SELECT DISTINCT latitude, longitude,
         CAST(incident_ts AS DATE) AS date, hour(incident_ts) AS hour,
         CAST((day(CAST(incident_ts AS DATE)) * 24 + hour(incident_ts)) % 100
              AS INTEGER) AS weather_code
  FROM coords WHERE latitude IS NOT NULL AND longitude IS NOT NULL
)
SELECT s.day_of_week, s.time_of_day, w.weather_code AS weather, s.location,
       lr.location_rank, s.side_of_town, nr.incident_rank, s.nature, s.emsstat
FROM sided s
LEFT JOIN locrank lr ON s.location = lr.location
LEFT JOIN natrank nr ON s.nature = nr.nature
LEFT JOIN wh w
  ON s.latitude = w.latitude AND s.longitude = w.longitude
 AND CAST(s.incident_ts AS DATE) = w.date AND hour(s.incident_ts) = w.hour
"""


_P6_HREFS = """
    SELECT '/sites/default/files/documents/' || strftime(o_orderdate, '%Y-%m')
           || '/' || strftime(o_orderdate, '%Y-%m-%d')
           || CASE WHEN o_orderkey % 3 = 0 THEN '_daily_incident_summary.pdf'
                   WHEN o_orderkey % 3 = 1 THEN '_daily_case_summary.pdf'
                   ELSE '_daily_arrest_summary.pdf' END AS href
    FROM orders
"""

_P6_CLASSIFIED = f"""
    SELECT DISTINCT href,
      CASE
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_incident_summary\\.pdf')
          THEN 'incident'
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_case_summary\\.pdf')
          THEN 'case'
        WHEN regexp_matches(href, '/sites/default/files/documents/\\d{{4}}-\\d{{2}}/\\d{{4}}-\\d{{2}}-\\d{{2}}_daily_arrest_summary\\.pdf')
          THEN 'arrest'
      END AS report_kind,
      CASE WHEN regexp_extract(href, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0) <> ''
           THEN CAST(regexp_extract(href, '\\d{{4}}-\\d{{2}}-\\d{{2}}', 0) AS DATE)
      END AS report_date
    FROM ({_P6_HREFS})
"""


def _documents_as_media(docs: DataFrame) -> DataFrame:
    # opaque-binary media table derived deterministically from the
    # documents fixture: payload = UTF-8 bytes of the text
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/png").alias("mime"),
    )


_SQL1 = """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(rank() OVER (ORDER BY count(*) DESC, o_orderpriority)
                AS INTEGER) AS priority_rank
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
"""


def _dec(c):
    return F.col(c).cast("decimal(18,2)")


def _rev_expr():
    # decimal-exact extendedprice*(1-discount), the common money term
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


MIXTURE_TARGETS_BP = {"src0": 6000, "src1": 3000, "src2": 1000}


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — generated alongside, same constants
# ---------------------------------------------------------------------------

# hyperplane-LSH signature pipeline (mirrors
# datapipe/similarity.py:hyperplane_signatures — same md5 Rademacher
# planes, same floor(x·10⁶) quantization)
_HYPERPLANE_SIGS_CTE = """comp AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS d,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS qx
              FROM embeddings
            ),
            proj AS (
              SELECT c.vec_id, p.j,
                     sum(c.qx * (CASE WHEN
                       ('0x' || substr(md5('hp' || p.j || ':' || c.d), 1, 8))::BIGINT
                       % 2 = 0 THEN 1 ELSE -1 END)) AS s
              FROM comp c
              CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) p
              GROUP BY 1, 2
            ),
            sigs AS (
              SELECT vec_id,
                     CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << j)
                              ELSE 0 END) AS BIGINT) AS sig
              FROM proj GROUP BY vec_id
            )"""

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKENS = f"string_split_regex({_NORM}, ' +')"

_TOKEN_COUNT = f"CASE WHEN {_NORM} = '' THEN 0 ELSE len({_TOKENS}) END"
_HASH32 = "('0x' || substr(md5({x}), 1, 8))::BIGINT"

# bloom/cms coordinate generators (mirror datapipe/sketch.py)
_BLOOM_POS = "\n              UNION ALL ".join(
    f"SELECT doc_id, ('0x' || substr(md5('bloom{j}:' || f), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
# dc7: Bloom positions keyed by gram (build side) and by (doc_id,
# gram) (probe side) — same md5 basis as _BLOOM_POS.
_BLOOM_GPOS = "\n              UNION ALL ".join(
    f"SELECT ('0x' || substr(md5('bloom{j}:' || gram), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
_BLOOM_GPOS_DOC = "\n              UNION ALL ".join(
    f"SELECT doc_id, gram,"
    f" ('0x' || substr(md5('bloom{j}:' || gram), 1, 8))::BIGINT"
    f" % {BLOOM_M} AS bit FROM {{src}}"
    for j in range(BLOOM_K)
)
# dc7 / st17 share one oracle: the streaming probe is the identical
# stateless computation over the identical split (batch ≡ stream)
_DC7_BLOOM_SQL = f"""
            WITH w AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
              FROM w, unnest(generate_series(1, greatest(len(toks) - 7, 1)))
                       AS t(i)
            ),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
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
            hit AS (SELECT DISTINCT doc_id FROM ghit)
            SELECT d.doc_id,
                   CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS contaminated
            FROM documents d LEFT JOIN hit h USING (doc_id)
            WHERE d.doc_id % 50 <> 0
        """

_CMS_POS = "\n              UNION ALL ".join(
    f"SELECT l_partkey, {j} AS j,"
    f" ('0x' || substr(md5('cms{j}:' || {{keyexpr}}), 1, 8))::BIGINT"
    f" % {CMS_W} AS bucket FROM {{src}}"
    for j in range(CMS_D)
)

_SHINGLES3 = f"""
    SELECT doc_id, DISTINCT_SH.shingle FROM (
      SELECT doc_id, toks FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    ) t,
    LATERAL (
      SELECT DISTINCT array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
      FROM unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
    ) DISTINCT_SH
"""

_MINHASH_TERMS = ",\n".join(
    f"      min(({MINHASH_A[j]} * x + {MINHASH_B[j]}) % {MINHASH_PRIME}) AS mh{j}"
    for j in range(NUM_HASHES)
)
_BAND_TERMS = ", ".join(
    f"({b}, md5("
    + " || '-' || ".join(
        f"CAST(mh{b * BAND_SIZE + r} AS VARCHAR)" for r in range(BAND_SIZE)
    )
    + "))"
    for b in range(NUM_HASHES // BAND_SIZE)
)

_MINHASH_BANDS_SQL = f"""
WITH sh AS ({_SHINGLES3}),
hx AS (SELECT doc_id, {_HASH32.format(x='shingle')} AS x FROM sh),
sig AS (
  SELECT doc_id,
{_MINHASH_TERMS}
  FROM hx GROUP BY doc_id
)
SELECT doc_id, b.band_id, b.band_hash
FROM sig, LATERAL (
  SELECT * FROM (VALUES {_BAND_TERMS}) AS v(band_id, band_hash)
) b
"""

# 64-bit simhash: bit i<32 from the first md5 word (h1), else the
# second (h2); bit 63 is the signed-long minimum (two's complement)
_SIMHASH_SUM_TERMS = ",\n".join(
    f"      sum(CASE WHEN ({'h1' if i < 32 else 'h2'} & {1 << (i % 32)}) <> 0"
    f" THEN 1 ELSE -1 END) AS s{i}"
    for i in range(64)
)
_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN "
    + ("(-9223372036854775807 - 1)" if i == 63 else str(1 << i))
    + " ELSE 0 END)"
    for i in range(64)
)

_STOPWORD_SETS = {
    code: "[" + ", ".join(f"'{w}'" for w in STOPWORDS[code]) + "]"
    for code in STOPWORDS
}
_LANG_SCORES = ",\n".join(
    f"      len(list_filter({_TOKENS}, t -> list_contains({_STOPWORD_SETS[code]}, t))) AS sc_{code}"
    for code in sorted(STOPWORDS)
)
_LANG_BEST = "greatest(" + ", ".join(f"sc_{c}" for c in sorted(STOPWORDS)) + ")"
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN sc_{c} = {_LANG_BEST} AND {_LANG_BEST} > 0 THEN '{c}'"
        for c in sorted(STOPWORDS)
    )
    + " ELSE 'und' END"
)

_TA11_SQL = f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS ts FROM documents),
            tok AS (
              SELECT doc_id, unnest(ts) AS tok,
                     unnest(range(len(ts))) AS pos
              FROM toks
            ),
            counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
            tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS v
              FROM counts
            ),
            per AS (
              SELECT t.doc_id, t.pos,
                     CAST(tot.n_total + tot.v AS DOUBLE)
                       / CAST(co.c + 1 AS DOUBLE) AS ip
              FROM tok t JOIN counts co ON t.tok = co.tok, tot
            ),
            agg AS (
              SELECT doc_id, sum(ip ORDER BY pos) AS sum_ip,
                     count(*) AS n FROM per GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   sum_ip / CAST(n AS DOUBLE) AS mean_inv_prob
            FROM agg
"""

# gr1: 5 unrolled damped PageRank rounds over the near-dup citation
# graph (edges newer -> older doc). Every double op mirrors the Spark
# operator's ordered-fold mode: od is an exact integer-valued double,
# contributions fold in src order, the damping literals parse to the
# same binary64 on both engines.
_GR1_ITER = """,
            s{k} AS (
              SELECT e.dst, sum(r.pr / d.od ORDER BY e.src) AS s
              FROM edges e JOIN deg d ON e.src = d.src
                   JOIN r{p} r ON e.src = r.id
              GROUP BY e.dst
            ),
            r{k} AS (
              SELECT n.id,
                     CAST(0.15 AS DOUBLE)
                       + CAST(0.85 AS DOUBLE)
                         * coalesce(s.s, CAST(0.0 AS DOUBLE)) AS pr
              FROM nodes n LEFT JOIN s{k} s ON n.id = s.dst
            )"""

_GR1_PAGERANK_SQL = (
    f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (SELECT b AS src, a AS dst FROM pairs),
            deg AS (
              SELECT src, CAST(count(*) AS DOUBLE) AS od
              FROM edges GROUP BY src
            ),
            nodes AS (SELECT doc_id AS id FROM documents),
            r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""
    + "".join(_GR1_ITER.format(k=k, p=k - 1) for k in range(1, 6))
    + """
            SELECT id AS doc_id, pr FROM r5
"""
)

# gr2: PageRank over the DIV-16 ancestry DAG, 8 unrolled rounds.
# The Spark side exits at the bit-exact fixpoint (depth+1 rounds);
# on a DAG the remaining unrolled rounds are identity, so r8 == the
# early-exited iterate bit-for-bit.
_GR2_SQL = (
    """
            WITH edges AS (
              SELECT doc_id AS src, doc_id // 16 AS dst
              FROM documents WHERE doc_id >= 1
            ),
            deg AS (
              SELECT src, CAST(count(*) AS DOUBLE) AS od
              FROM edges GROUP BY src
            ),
            nodes AS (SELECT doc_id AS id FROM documents),
            r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM nodes)"""
    + "".join(_GR1_ITER.format(k=k, p=k - 1) for k in range(1, 9))
    + """
            SELECT id AS doc_id, pr FROM r8
"""
)

# gr3: HITS, 4 unrolled integer rounds over the LSH citation graph.
# No normalization → every score is an exact integer sum, so plain
# unordered SUM matches Spark bit-for-bit by associativity. DuckDB
# sums BIGINT into HUGEINT — cast back at each step.
_GR3_HALF = """,
            a{k} AS (
              SELECT e.dst AS id, CAST(sum(h.s) AS BIGINT) AS s
              FROM edges e JOIN h{p} h ON e.src = h.id GROUP BY e.dst
            ),
            h{k} AS (
              SELECT e.src AS id, CAST(sum(a.s) AS BIGINT) AS s
              FROM edges e JOIN a{k} a ON e.dst = a.id GROUP BY e.src
            )"""

_GR3_HITS_SQL = (
    f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (SELECT b AS src, a AS dst FROM pairs),
            nodes AS (SELECT doc_id AS id FROM documents),
            h0 AS (SELECT id, CAST(1 AS BIGINT) AS s FROM nodes)"""
    + "".join(_GR3_HALF.format(k=k, p=k - 1) for k in range(1, 5))
    + """
            SELECT n.id AS doc_id,
                   CAST(coalesce(a4.s, 0) AS BIGINT) AS authority,
                   CAST(coalesce(h4.s, 0) AS BIGINT) AS hub
            FROM nodes n
            LEFT JOIN a4 ON n.id = a4.id
            LEFT JOIN h4 ON n.id = h4.id
"""
)

# tok1: BPE merge learning, 3 unrolled training rounds. The greedy
# left-to-right re-segmentation is the same sequential string fold as
# datapipe/bpe.py (list_reduce == Spark aggregate, element order
# pinned by the list itself); the winning pair per round is the
# deterministic (count desc, pair asc) argmin over the pair-count
# relation, so both engines learn the identical merge table.
_TOK1_PAIRS = """
              SELECT arr[i] AS a, arr[i + 1] AS b, count(*) AS c
              FROM {src}, unnest(generate_series(1, len(arr) - 1)) AS s(i)
              GROUP BY 1, 2
"""
_TOK1_APPLY = """string_split(list_reduce(list_prepend('', arr),
                (acc, v) -> CASE
                  WHEN acc = '' THEN v
                  WHEN v = mb AND acc = ma
                    THEN ma || chr(31) || mb
                  WHEN v = mb AND right(acc, length(ma) + 1) = ' ' || ma
                    THEN substr(acc, 1, length(acc) - length(ma))
                         || ma || chr(31) || mb
                  ELSE acc || ' ' || v END), ' ')"""

_TOK_CHAIN_SQL = (
    f"""t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            pc1 AS ({_TOK1_PAIRS.format(src='t1')}),
            m1 AS (SELECT a AS ma, b AS mb, c FROM pc1
                   ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            t{k} AS (SELECT doc_id, {_TOK1_APPLY} AS arr
                     FROM t{k - 1}, m{k - 1}),
            pc{k} AS ({_TOK1_PAIRS.format(src=f't{k}')}),
            m{k} AS (SELECT a AS ma, b AS mb, c FROM pc{k}
                     ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
)

_TOK1_BPE_SQL = (
    "\n            WITH "
    + _TOK_CHAIN_SQL
    + """
            SELECT it, ma AS a, mb AS b, CAST(c AS BIGINT) AS cnt FROM (
              SELECT 1 AS it, ma, mb, c FROM m1
              UNION ALL SELECT 2, ma, mb, c FROM m2
              UNION ALL SELECT 3, ma, mb, c FROM m3
            )
"""
)

# tok3: WordPiece greedy longest-match, same semantics as
# datapipe/wordpiece.py but a deliberately different fold shape:
# DuckDB 1.0.0's list_reduce mis-binds values across rows when the
# accumulator is a STRUCT and rows' lists have different lengths
# (verified by minimal repro — row 2's fold reads row 1's elements),
# while VARCHAR-accumulator folds (the tok1 shape) are correct. The
# greedy choice at a position doesn't depend on the accumulator, so
# the pick per position precomputes in list_transform (safe), and
# the fold only walks the skip counts: acc = '<skip>|<fp>'.
_TOK3_PICKS = """list_transform(generate_series(1, length(w)),
      p -> CASE
        WHEN length(substr(w, CAST(p AS INT), 3)) = 3
             AND list_contains(vocab, substr(w, CAST(p AS INT), 3))
          THEN substr(w, CAST(p AS INT), 3)
        WHEN length(substr(w, CAST(p AS INT), 2)) = 2
             AND list_contains(vocab, substr(w, CAST(p AS INT), 2))
          THEN substr(w, CAST(p AS INT), 2)
        ELSE substr(w, CAST(p AS INT), 1) END)"""

_TOK3_FOLD = """split_part(list_reduce(
  list_prepend('0|', picks),
  (acc, x) -> CASE
    WHEN CAST(split_part(acc, '|', 1) AS BIGINT) > 0
      THEN CAST(CAST(split_part(acc, '|', 1) AS BIGINT) - 1 AS VARCHAR)
           || '|' || split_part(acc, '|', 2)
    ELSE CAST(length(x) - 1 AS VARCHAR) || '|'
         || split_part(acc, '|', 2) || ' ' || x
  END), '|', 2)"""

_TOK3_WORDPIECE_SQL = f"""
            WITH t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            words AS (
              SELECT doc_id, pos, arr[pos] AS w
              FROM t1, unnest(generate_series(1, len(arr))) AS s(pos)
              WHERE length(arr[pos]) >= 1
            ),
            singles AS (
              SELECT DISTINCT substr(w, CAST(p AS INT), 1) AS piece
              FROM words, unnest(generate_series(1, length(w))) AS q(p)
            ),
            multi AS (
              SELECT piece FROM (
                SELECT piece, count(*) AS c FROM (
                  SELECT substr(w, CAST(p AS INT), 2) AS piece
                  FROM words, unnest(generate_series(1, length(w))) AS q(p)
                  WHERE length(substr(w, CAST(p AS INT), 2)) = 2
                  UNION ALL
                  SELECT substr(w, CAST(p AS INT), 3)
                  FROM words, unnest(generate_series(1, length(w))) AS q(p)
                  WHERE length(substr(w, CAST(p AS INT), 3)) = 3
                ) GROUP BY piece
              ) ORDER BY c DESC, piece LIMIT 40
            ),
            v AS (
              SELECT list_sort(list(piece)) AS vocab FROM (
                SELECT piece FROM singles UNION SELECT piece FROM multi
              )
            ),
            pkd AS (
              SELECT doc_id, pos, {_TOK3_PICKS} AS picks
              FROM words, v
            ),
            enc AS (
              SELECT doc_id, pos, {_TOK3_FOLD} AS fp
              FROM pkd
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(len(string_split(fp, ' ')) - 1) AS BIGINT)
                     AS n_pieces,
                   md5(string_agg(fp, '|' ORDER BY pos)) AS fp
            FROM enc GROUP BY doc_id
"""

_TOK2_BPE_SQL = (
    "\n            WITH "
    + _TOK_CHAIN_SQL
    + f""",
            t4 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM t3, m3)
            SELECT t1.doc_id, CAST(len(t1.arr) AS BIGINT) AS n_raw,
                   CAST(len(t4.arr) AS BIGINT) AS n_bpe
            FROM t1 JOIN t4 ON t1.doc_id = t4.doc_id
"""
)

# tok4: sampled-corpus BPE training — merges m1..m3 learned from the
# deterministic md5-hash half (the same _HASH32 split as tp2), then
# the FULL corpus encoded once with the learned table. Same greedy
# fold as tok1/tok2; only the training relation changes.
_TOK4_SAMPLED_SQL = (
    f"""
            WITH s1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents
                        WHERE ({_HASH32.format(x="'bpe:' || doc_id")}
                               % 10000) < 5000),
            pc1 AS ({_TOK1_PAIRS.format(src='s1')}),
            m1 AS (SELECT a AS ma, b AS mb, c FROM pc1
                   ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            s{k} AS (SELECT doc_id, {_TOK1_APPLY} AS arr
                     FROM s{k - 1}, m{k - 1}),
            pc{k} AS ({_TOK1_PAIRS.format(src=f's{k}')}),
            m{k} AS (SELECT a AS ma, b AS mb, c FROM pc{k}
                     ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
    + f""",
            t1 AS (SELECT doc_id, {_TOKENS} AS arr FROM documents),
            f1 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM t1, m1),
            f2 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM f1, m2),
            f3 AS (SELECT doc_id, {_TOK1_APPLY} AS arr FROM f2, m3)
            SELECT t1.doc_id, CAST(len(t1.arr) AS BIGINT) AS n_raw,
                   CAST(len(f3.arr) AS BIGINT) AS n_bpe
            FROM t1 JOIN f3 ON t1.doc_id = f3.doc_id
"""
)

# tok5/tok6: classic CHARACTER-level BPE trained on the word
# histogram (frequency-weighted pair counts over distinct words —
# the Sennrich reduction; datapipe/bpe.py `learn_bpe_merges_chars`).
# Same greedy _TOK1_APPLY fold, but symbols are characters and every
# pc{k} weights by the word's corpus frequency.
_TOK5_CHARS = (
    "list_transform(generate_series(1, length(w)),"
    " p -> substr(w, CAST(p AS INT), 1))"
)
_TOK5_PAIRS = """
              SELECT arr[i] AS a, arr[i + 1] AS b, SUM(freq) AS c
              FROM {src}, unnest(generate_series(1, len(arr) - 1)) AS s(i)
              GROUP BY 1, 2
"""
_TOK5_CHAIN = (
    f"""wh AS (
              SELECT arr[i] AS w, count(*) AS freq
              FROM (SELECT {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(i)
              WHERE length(arr[i]) >= 1
              GROUP BY 1
            ),
            c1 AS (SELECT w, freq, {_TOK5_CHARS} AS arr FROM wh),
            wc1 AS ({_TOK5_PAIRS.format(src='c1')}),
            wm1 AS (SELECT a AS ma, b AS mb, c FROM wc1
                    ORDER BY c DESC, a, b LIMIT 1)"""
    + "".join(
        f""",
            c{k} AS (SELECT w, freq, {_TOK1_APPLY} AS arr
                     FROM c{k - 1}, wm{k - 1}),
            wc{k} AS ({_TOK5_PAIRS.format(src=f'c{k}')}),
            wm{k} AS (SELECT a AS ma, b AS mb, c FROM wc{k}
                      ORDER BY c DESC, a, b LIMIT 1)"""
        for k in range(2, 4)
    )
)

_TOK5_CHAR_MERGES_SQL = (
    "\n            WITH "
    + _TOK5_CHAIN
    + """
            SELECT it, ma AS a, mb AS b, CAST(c AS BIGINT) AS cnt FROM (
              SELECT 1 AS it, ma, mb, c FROM wm1
              UNION ALL SELECT 2, ma, mb, c FROM wm2
              UNION ALL SELECT 3, ma, mb, c FROM wm3
            )
"""
)

_TOK6_CHAR_ENCODE_SQL = (
    "\n            WITH "
    + _TOK5_CHAIN
    + f""",
            c4 AS (SELECT w, freq, {_TOK1_APPLY} AS arr FROM c3, wm3),
            wp AS (SELECT w, len(arr) AS np FROM c4),
            dw AS (
              SELECT doc_id, arr[i] AS w
              FROM (SELECT doc_id, {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(i)
              WHERE length(arr[i]) >= 1
            )
            SELECT doc_id,
                   count(*) AS n_words,
                   CAST(SUM(length(w)) AS BIGINT) AS n_chars,
                   CAST(SUM(np) AS BIGINT) AS n_bpe
            FROM dw JOIN wp USING (w)
            GROUP BY doc_id
"""
)

_DOT = "list_dot_product(a.v, b.v)"
_COS = f"{_DOT} / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

_SESSIONIZATION_SQL = """
    SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions FROM (
      SELECT user_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) GROUP BY user_id
"""

_TUMBLING_SQL = """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
"""


_S5_PARSE_SQL = """
            WITH fields AS (
              SELECT doc_id,
                     printf('%d/%d/2024 %d:%02d', doc_id % 12 + 1,
                            doc_id % 28 + 1, doc_id % 24, doc_id % 60) AS dt,
                     printf('2024-%05d', doc_id) AS inc,
                     printf('BLK %d MAIN ST', doc_id % 50 * 100) AS loca,
                     printf(' APT %d', doc_id % 20) AS locb,
                     ['THEFT','FRAUD','EMS','ERROR','PATROL'][
                       CAST(doc_id % 5 + 1 AS INTEGER)] AS nat,
                     CASE WHEN doc_id % 5 = 2 THEN 'EMSSTAT'
                          ELSE 'OK0109973' END AS ori
              FROM documents
            ),
            data AS (
              SELECT 'reports/daily.pdf' AS path,
                     CAST(floor(doc_id / 10) AS BIGINT) AS page_number,
                     CAST(doc_id % 10
                          + CASE WHEN doc_id < 10 THEN 1 ELSE 0 END
                          AS BIGINT) AS block_idx,
                     (CASE WHEN doc_id % 7 = 3
                           THEN concat_ws(chr(10), dt, inc, ori)
                           WHEN doc_id % 7 = 5
                           THEN concat_ws(chr(10), dt, inc, loca, locb, nat, ori)
                           ELSE concat_ws(chr(10), dt, inc, loca, nat, ori)
                      END) || chr(10) AS block_text
              FROM fields
            ),
            mx AS (SELECT max(doc_id) AS max_id FROM documents),
            extras AS (
              SELECT 'reports/daily.pdf' AS path, CAST(0 AS BIGINT) AS page_number,
                     CAST(0 AS BIGINT) AS block_idx,
                     'NORMAN POLICE DEPARTMENT' || chr(10) ||
                     'Daily Incident Summary (Public)' || chr(10) AS block_text
              UNION ALL
              SELECT 'reports/daily.pdf', 0, 11, 'Report Generated' || chr(10)
              UNION ALL
              SELECT 'reports/daily.pdf', 0, 12, 'Page 1' || chr(10)
              UNION ALL
              SELECT 'reports/daily.pdf', CAST(floor(max_id / 10) AS BIGINT),
                     CAST(max_id % 10 + 1 AS BIGINT), 'End of Report' || chr(10)
              FROM mx
            ),
            blocks AS (
              SELECT * FROM data UNION ALL SELECT * FROM extras
            ),
            sized AS (
              SELECT b.*,
                     count(*) OVER (PARTITION BY path, page_number) AS nb,
                     max(page_number) OVER (PARTITION BY path) AS lastp
              FROM blocks b
            ),
            kept AS (
              SELECT path, page_number, block_idx,
                     string_split(block_text, chr(10)) AS ls
              FROM sized
              WHERE CASE
                WHEN page_number = 0
                  THEN block_idx >= 1 AND block_idx <= nb - 3
                WHEN page_number = lastp THEN block_idx <= nb - 2
                ELSE TRUE END
            ),
            removed AS (
              SELECT path, page_number, block_idx,
                     CASE WHEN COALESCE(list_position(ls, ''), 0) > 0
                          THEN list_slice(ls, 1, list_position(ls, '') - 1)
                               || list_slice(ls, list_position(ls, '') + 1,
                                             len(ls))
                          ELSE ls END AS t
              FROM kept
            ),
            norm AS (
              SELECT path, page_number, block_idx,
                     CASE WHEN len(t) < 5
                          THEN list_slice(t, 1, 2) || [' ', ' ']
                               || list_slice(t, 3, len(t))
                          WHEN len(t) > 5
                          THEN list_slice(t, 1, 2) || [t[3] || t[4]]
                               || list_slice(t, 5, len(t))
                          ELSE t END AS v
              FROM removed
            )
            SELECT path, page_number, block_idx,
                   v[1] AS datetime_str, v[2] AS incident_num,
                   v[3] AS location, v[4] AS nature, v[5] AS incident_ori
            FROM norm
        """


# DuckDB twin of sinks.zorder.morton_code(bits=7): bit i of px lands
# at 2i, bit i of py at 2i+1 — generated once so both engines share
# the identical interleave
_MORTON7_SQL = " + ".join(
    f"(((px >> {i}) & 1) << {2 * i}) + (((py >> {i}) & 1) << {2 * i + 1})"
    for i in range(7)
)


# ---------------------------------------------------------------
# tok9/tok10: unigram-LM tokenizer (datapipe/unigram.py twin).
# Per-round Viterbi DP as a recursive CTE with a sliding 4-position
# window of typed DOUBLE/VARCHAR columns — no list_reduce (DuckDB
# 1.0.0's struct-accumulator mis-binding, the tok3 lesson) and no
# serialization round-trips. Candidates are evaluated via a CASE
# cascade on greatest(): argmax with ties resolving to the LONGEST
# piece, the exact tie-break of viterbi_segment's longest-first
# strict-> scan. All probabilities are (c+1)/(T+|V|) — one exact
# IEEE division — and path scores multiply left-to-right, so every
# double is bit-identical to the Spark kernel's. Multi-referenced
# CTEs are MATERIALIZED (the gr6 lesson).
# ---------------------------------------------------------------
_UNI_MAXLEN, _UNI_SEED_K, _UNI_KEEP_K = 4, 60, 40

_UNI_DP = """
p{n} AS MATERIALIZED (
  SELECT map(list(piece), list(pr)) AS m FROM {probs}
),
dp{n} AS (
  SELECT w, 0 AS i,
         CAST(1.0 AS DOUBLE) AS b0, '' AS q0,
         CAST(NULL AS DOUBLE) AS b1, CAST(NULL AS VARCHAR) AS q1,
         CAST(NULL AS DOUBLE) AS b2, CAST(NULL AS VARCHAR) AS q2,
         CAST(NULL AS DOUBLE) AS b3, CAST(NULL AS VARCHAR) AS q3
  FROM wh
  UNION ALL
  SELECT w, i + 1, nb, nq, b0, q0, b1, q1, b2, q2
  FROM (
    SELECT w, i, b0, q0, b1, q1, b2, q2,
      greatest(coalesce(c4, -1.0), coalesce(c3, -1.0),
               coalesce(c2, -1.0), c1) AS nb,
      CASE greatest(coalesce(c4, -1.0), coalesce(c3, -1.0),
                    coalesce(c2, -1.0), c1)
        WHEN c4 THEN q3 || ' ' || substr(w, i - 2, 4)
        WHEN c3 THEN q2 || ' ' || substr(w, i - 1, 3)
        WHEN c2 THEN q1 || ' ' || substr(w, i, 2)
        ELSE q0 || ' ' || substr(w, i + 1, 1) END AS nq
    FROM (
      SELECT dp{n}.*,
        CASE WHEN i >= 3 AND len(m[substr(w, i - 2, 4)]) > 0
             THEN b3 * m[substr(w, i - 2, 4)][1] END AS c4,
        CASE WHEN i >= 2 AND len(m[substr(w, i - 1, 3)]) > 0
             THEN b2 * m[substr(w, i - 1, 3)][1] END AS c3,
        CASE WHEN i >= 1 AND len(m[substr(w, i, 2)]) > 0
             THEN b1 * m[substr(w, i, 2)][1] END AS c2,
        b0 * m[substr(w, i + 1, 1)][1] AS c1
      FROM dp{n}, p{n}
      WHERE i < length(w)
    )
  )
),
seg{n} AS MATERIALIZED (
  SELECT dp{n}.w, wh.freq, trim(q0) AS pieces
  FROM dp{n} JOIN wh USING (w) WHERE i = length(w)
),
e{n} AS MATERIALIZED (
  SELECT u.piece, SUM(freq) AS cnt
  FROM seg{n}, unnest(string_split(pieces, ' ')) AS u(piece)
  GROUP BY 1
)
"""

_UNI_COMMON = (
    f"""
wh AS MATERIALIZED (
  SELECT arr[i] AS w, count(*) AS freq
  FROM (SELECT {_TOKENS} AS arr FROM documents),
       unnest(generate_series(1, len(arr))) AS s(i)
  WHERE length(arr[i]) >= 1
  GROUP BY 1
),
subs AS MATERIALIZED (
  SELECT substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece,
         SUM(freq) AS cnt
  FROM wh,
       unnest(generate_series(1, length(w))) AS q(p),
       unnest(generate_series(1, {_UNI_MAXLEN})) AS r(l)
  WHERE p + l - 1 <= length(w)
  GROUP BY 1
),
v0 AS MATERIALIZED (
  SELECT piece, cnt FROM subs WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE length(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {_UNI_SEED_K})
),
pr1 AS MATERIALIZED (
  SELECT piece,
         CAST(cnt + 1 AS DOUBLE)
         / (SELECT CAST(SUM(cnt) + COUNT(*) AS DOUBLE) FROM v0) AS pr
  FROM v0
),
"""
    + _UNI_DP.format(n=1, probs="pr1")
    + f""",
c1 AS MATERIALIZED (
  SELECT v0.piece, COALESCE(e1.cnt, 0) AS cnt
  FROM v0 LEFT JOIN e1 USING (piece)
),
pr2 AS MATERIALIZED (
  SELECT piece,
         CAST(cnt + 1 AS DOUBLE)
         / (SELECT CAST(SUM(cnt) + COUNT(*) AS DOUBLE) FROM c1) AS pr
  FROM c1
),
"""
    + _UNI_DP.format(n=2, probs="pr2")
    + f""",
c2 AS MATERIALIZED (
  SELECT v0.piece, COALESCE(e2.cnt, 0) AS cnt
  FROM v0 LEFT JOIN e2 USING (piece)
),
fin AS MATERIALIZED (
  SELECT piece, cnt FROM c2 WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM c2 WHERE length(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {_UNI_KEEP_K})
)
"""
)

_TOK9_UNIGRAM_SQL = f"""
            WITH RECURSIVE {_UNI_COMMON}
            SELECT piece, CAST(cnt AS BIGINT) AS cnt,
                   CAST(length(piece) AS INT) AS nchars
            FROM fin
"""

_TOK10_UNIGRAM_SQL = (
    f"""
            WITH RECURSIVE {_UNI_COMMON},
            prf AS MATERIALIZED (
              SELECT piece,
                     CAST(cnt + 1 AS DOUBLE)
                     / (SELECT CAST(SUM(cnt) + COUNT(*) AS DOUBLE)
                        FROM fin) AS pr
              FROM fin
            ),
"""
    + _UNI_DP.format(n=3, probs="prf")
    + f""",
            dwords AS (
              SELECT doc_id, pos, arr[pos] AS w
              FROM (SELECT doc_id, {_TOKENS} AS arr FROM documents),
                   unnest(generate_series(1, len(arr))) AS s(pos)
              WHERE length(arr[pos]) >= 1
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                   CAST(SUM(len(string_split(pieces, ' '))) AS BIGINT)
                     AS n_pieces,
                   md5(string_agg(pieces, '|' ORDER BY pos)) AS fp
            FROM dwords JOIN seg3 USING (w)
            GROUP BY doc_id
"""
)


# gr7: strongly connected components of the directed link graph
# (datapipe/clusters.py strongly_connected_components twin). Edges:
# per-16-bucket rotations (every doc on a cycle) + LSH "citation"
# chords newer→older, with the FORWARD chord added when (a+b)%3=0 —
# mutual dup pairs, so cross-bucket SCC contraction actually
# happens. Oracle: reachability closure via recursive CTE (UNION
# dedup), scc_id(v) = min over {v} ∪ {u : u →* v AND v →* u} — the
# definitional form, independent of either engine's algorithm.
_GR7_SCC_SQL = f"""
            WITH RECURSIVE
            bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            rot AS (
              SELECT doc_id AS src,
                     coalesce(lead(doc_id) OVER w,
                              first_value(doc_id) OVER w) AS dst
              FROM documents
              WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
            ),
            edges AS MATERIALIZED (
              SELECT src, dst FROM rot
              UNION SELECT b AS src, a AS dst FROM pairs
              UNION SELECT a AS src, b AS dst FROM pairs
                WHERE (a + b) % 3 = 0
            ),
            reach AS (
              SELECT src AS u, dst AS v FROM edges
              UNION
              SELECT r.u, e.dst FROM reach r JOIN edges e ON r.v = e.src
            ),
            mutual AS MATERIALIZED (
              SELECT r1.u AS node, r1.v AS other
              FROM reach r1 JOIN reach r2 ON r1.u = r2.v AND r1.v = r2.u
            )
            SELECT d.doc_id,
                   least(d.doc_id,
                         coalesce(min(m.other), d.doc_id)) AS scc_id
            FROM documents d LEFT JOIN mutual m ON m.node = d.doc_id
            GROUP BY d.doc_id
"""


# gr8: personalized PageRank (datapipe/pagerank.py
# personalized_pagerank twin) — teleport restricted to the seed set
# (doc_id % 50 = 0), r0 = 1_S, update = 0.15·1_S + 0.85·incoming,
# ordered ascending-src fold (the gr1 bit-exact contract).
_GR8_ITER = """,
            ps{k} AS (
              SELECT e.dst, sum(r.pr / d.od ORDER BY e.src) AS s
              FROM edges e JOIN deg d ON e.src = d.src
                   JOIN pr{p} r ON e.src = r.id
              GROUP BY e.dst
            ),
            pr{k} AS (
              SELECT n.id,
                     CAST(0.15 AS DOUBLE) * n.s
                       + CAST(0.85 AS DOUBLE)
                         * coalesce(ps.s, CAST(0.0 AS DOUBLE)) AS pr
              FROM sflag n LEFT JOIN ps{k} ps ON n.id = ps.dst
            )"""

_GR8_PPR_SQL = (
    f"""
            WITH bands AS ({_MINHASH_BANDS_SQL}),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            edges AS (SELECT b AS src, a AS dst FROM pairs),
            deg AS (
              SELECT src, CAST(count(*) AS DOUBLE) AS od
              FROM edges GROUP BY src
            ),
            sflag AS (
              SELECT doc_id AS id,
                     CASE WHEN doc_id % 50 = 0
                          THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END AS s
              FROM documents
            ),
            pr0 AS (SELECT id, s AS pr FROM sflag)"""
    + "".join(_GR8_ITER.format(k=k, p=k - 1) for k in range(1, 6))
    + """
            SELECT id AS doc_id, pr AS ppr FROM pr5
"""
)


# dq7 / st23: exact two-sample KS per source (see operators/health.py
# ks_drift for the candidate-point argument) — the streaming twin
# maintains the same histogram, so one oracle serves both.
_KS_DRIFT_SQL = """
            WITH vals AS (SELECT source, n_chars AS x FROM documents),
            g AS (
              SELECT x, cnt, SUM(cnt) OVER (ORDER BY x) AS cum
              FROM (SELECT x, count(*) AS cnt FROM vals GROUP BY 1)
            ),
            s AS (
              SELECT source, x, cnt_s,
                     SUM(cnt_s) OVER (PARTITION BY source ORDER BY x)
                       AS cum_s
              FROM (SELECT source, x, count(*) AS cnt_s
                    FROM vals GROUP BY 1, 2)
            ),
            ns AS (SELECT source, SUM(cnt_s) AS n_s FROM s GROUP BY 1),
            tot AS (SELECT SUM(cnt) AS n FROM g),
            d AS (
              SELECT s.source,
                     MAX(greatest(
                       abs(CAST(s.cum_s AS HUGEINT) * tot.n
                           - CAST(g.cum AS HUGEINT) * ns.n_s),
                       abs(CAST(s.cum_s - s.cnt_s AS HUGEINT) * tot.n
                           - CAST(g.cum - g.cnt AS HUGEINT) * ns.n_s)
                     )) AS dmax
              FROM s JOIN g USING (x) JOIN ns USING (source), tot
              GROUP BY 1
            )
            SELECT d.source,
                   CAST(ns.n_s AS BIGINT) AS n_rows,
                   CAST((d.dmax * 10000)
                        // (CAST(ns.n_s AS HUGEINT) * tot.n)
                     AS BIGINT) AS ks_bp
            FROM d JOIN ns USING (source), tot
"""


# ts9 / st24: per-user peak concurrent half-open [ts, ts+30min)
# intervals via the integer sweep-line — the streaming twin maintains
# the per-(user, instant) net-delta histogram as state and runs the
# identical epilogue, so one oracle serves both.
_MAX_CONCURRENCY_SQL = """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + 1800000000 AS e
              FROM events
            ),
            deltas AS (
              SELECT user_id, s AS t, 1 AS d FROM iv
              UNION ALL
              SELECT user_id, e AS t, -1 AS d FROM iv
            ),
            run AS (
              SELECT user_id, t,
                     sum(d) OVER (
                       PARTITION BY user_id ORDER BY t, d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS c
              FROM deltas
            ),
            mc AS (
              SELECT user_id, t, c,
                     max(c) OVER (PARTITION BY user_id) AS m
              FROM run
            )
            SELECT user_id,
                   CAST(max(c) AS INTEGER) AS max_concurrency,
                   CAST(min(CASE WHEN c = m THEN t END) AS BIGINT)
                     AS peak_at_us
            FROM mc GROUP BY user_id
"""


# gr10: bounded multi-source directed BFS hop distance from the gr8
# seed set over gr7's citation graph (datapipe/clusters.py
# bfs_hop_distances twin). Oracle: recursive-CTE walk with UNION
# dedup on (node, d) — terminates because d is capped; min(d) per
# node is the BFS distance by definition, independent of either
# engine's frontier strategy.
_GR10_BFS_SQL = f"""
            WITH RECURSIVE
            bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            rot AS (
              SELECT doc_id AS src,
                     coalesce(lead(doc_id) OVER w,
                              first_value(doc_id) OVER w) AS dst
              FROM documents
              WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
            ),
            edges AS MATERIALIZED (
              SELECT src, dst FROM rot
              UNION SELECT b AS src, a AS dst FROM pairs
              UNION SELECT a AS src, b AS dst FROM pairs
                WHERE (a + b) % 3 = 0
            ),
            walk(id, d) AS (
              SELECT doc_id, 0 FROM documents WHERE doc_id % 50 = 0
              UNION
              SELECT e.dst, w.d + 1
              FROM walk w JOIN edges e ON e.src = w.id
              WHERE w.d < 4
            )
            SELECT id AS doc_id, CAST(min(d) AS INT) AS dist
            FROM walk GROUP BY 1
"""


# stat6 / st25: per-type exact-integer OLS drift line — the streaming
# twin maintains the same co-moment sums (shift-invariant, see
# functions/stats.py trend_from_moments), so one oracle serves both.
_LINEAR_TREND_SQL = """
            WITH t0 AS (
              SELECT min(epoch_us(ts) // 1000000) AS t0 FROM events
            ),
            base AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 1000000 - t0 AS HUGEINT) AS x,
                     CAST(floor(value * 1000) AS HUGEINT) AS y
              FROM events, t0
            ),
            agg AS (
              SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy,
                     sum(x * y) AS sxy
              FROM base GROUP BY 1
            ),
            f AS (
              SELECT event_type, n,
                     n * sxy - sx * sy AS num,
                     n * sxx - sx * sx AS den,
                     n * syy - sy * sy AS vary
              FROM agg
            )
            SELECT event_type,
                   CAST(n AS BIGINT) AS n,
                   CAST(CASE WHEN den = 0 THEN 0
                        WHEN num < 0 THEN -(((-num) * 86400) // den)
                        ELSE (num * 86400) // den END AS BIGINT)
                     AS slope_milli_per_day,
                   CAST(CASE WHEN den = 0 OR vary = 0 THEN 0
                        ELSE ((abs(num) * 10000 // vary) * abs(num)) // den
                        END AS BIGINT) AS r2_bp
            FROM f
"""


# gr12: directed reciprocity of the gr7 citation graph — |E ∩ E^T|
# over |E| in integer bp (self-loops from 1-node rotation buckets
# excluded on both sides).
_GR12_RECIPROCITY_SQL = f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            rot AS (
              SELECT doc_id AS src,
                     coalesce(lead(doc_id) OVER w,
                              first_value(doc_id) OVER w) AS dst
              FROM documents
              WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
            ),
            edges AS MATERIALIZED (
              SELECT src, dst FROM (
                SELECT src, dst FROM rot
                UNION SELECT b AS src, a AS dst FROM pairs
                UNION SELECT a AS src, b AS dst FROM pairs
                  WHERE (a + b) % 3 = 0
              ) WHERE src <> dst
            ),
            m AS (
              SELECT count(*) AS n_mutual
              FROM edges e JOIN edges r
                ON e.src = r.dst AND e.dst = r.src
            ),
            t AS (SELECT count(*) AS n_edges FROM edges)
            SELECT CAST(n_edges AS BIGINT) AS n_edges,
                   CAST(n_mutual AS BIGINT) AS n_mutual,
                   CAST((n_mutual * 10000) // n_edges AS BIGINT)
                     AS reciprocity_bp
            FROM t CROSS JOIN m
"""


# gr13: degree assortativity of the gr7 citation graph — Pearson
# correlation of (deg(src), deg(dst)) over directed edges, published
# as sign + two-step-floored r² in bp (stat6's overflow-safe idiom;
# HUGEINT here ≡ Spark's decimal(38,0) co-moments). Same edge CTE as
# gr12.
_GR13_ASSORT_SQL = f"""
            WITH bands AS MATERIALIZED ({_MINHASH_BANDS_SQL}),
            pairs AS MATERIALIZED (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
              FROM bands l JOIN bands r
                ON l.band_id = r.band_id AND l.band_hash = r.band_hash
              WHERE l.doc_id < r.doc_id
            ),
            rot AS (
              SELECT doc_id AS src,
                     coalesce(lead(doc_id) OVER w,
                              first_value(doc_id) OVER w) AS dst
              FROM documents
              WINDOW w AS (PARTITION BY doc_id // 16 ORDER BY doc_id)
            ),
            edges AS MATERIALIZED (
              SELECT src, dst FROM (
                SELECT src, dst FROM rot
                UNION SELECT b AS src, a AS dst FROM pairs
                UNION SELECT a AS src, b AS dst FROM pairs
                  WHERE (a + b) % 3 = 0
              ) WHERE src <> dst
            ),
            deg AS (
              SELECT v, CAST(count(*) AS HUGEINT) AS deg FROM (
                SELECT src AS v FROM edges
                UNION ALL SELECT dst AS v FROM edges
              ) GROUP BY v
            ),
            xy AS (
              SELECT ds.deg AS x, dd.deg AS y
              FROM edges e
              JOIN deg ds ON e.src = ds.v
              JOIN deg dd ON e.dst = dd.v
            ),
            agg AS (
              SELECT CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy,
                     sum(x * y) AS sxy
              FROM xy
            ),
            f AS (
              SELECT n,
                     n * sxy - sx * sy AS num,
                     n * sxx - sx * sx AS denx,
                     n * syy - sy * sy AS deny
              FROM agg
            )
            SELECT CAST(n AS BIGINT) AS n_edges,
                   CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1
                        ELSE 0 END AS INTEGER) AS assort_sign,
                   CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0
                        ELSE ((abs(num) * 10000 // denx) * abs(num)) // deny
                        END AS BIGINT) AS r2_bp
            FROM f
"""


# tp16 / st27: stratum mixture table under three temperature
# exponents — the streaming twin maintains the same stratum counts,
# so one oracle serves both.
_MIXTURE_CURVE_SQL = """
            WITH c AS (
              SELECT CASE WHEN doc_id % 10 < 6 THEN 'heavy'
                          WHEN doc_id % 10 < 9 THEN 'mid'
                          ELSE 'light' END AS stratum,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1
            ),
            w AS (
              SELECT 'T=2_flatten' AS temperature, stratum, n_docs,
                     CAST(floor(sqrt(n_docs * 1000000.0)) AS HUGEINT)
                       AS weight
              FROM c
              UNION ALL
              SELECT 'T=1_natural', stratum, n_docs,
                     CAST(n_docs AS HUGEINT)
              FROM c
              UNION ALL
              SELECT 'T=0.5_sharpen', stratum, n_docs,
                     CAST(n_docs AS HUGEINT) * n_docs
              FROM c
            )
            SELECT temperature, stratum, n_docs,
                   CAST(weight AS BIGINT) AS weight,
                   CAST((weight * 10000)
                        // sum(weight) OVER (PARTITION BY temperature)
                     AS BIGINT) AS share_bp
            FROM w
"""
