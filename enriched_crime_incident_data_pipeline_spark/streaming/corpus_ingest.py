"""Continuous corpus ingest: the streaming version of the batch
corpus builds (``registry.q_corpus_build2/3``).

Each micro-batch of arriving documents is deduplicated against the
PERSISTENT state of everything ingested before it, then appended:

1. **near-dup drop** — the batch's MinHash bands probe the standing
   band index via :func:`datapipe.dedup.incremental_lsh_pairs`
   (new-vs-corpus + new-vs-new equi-joins, never corpus²); a new doc
   drops iff it collides with ANY earlier doc (smaller id, in the
   index or in the batch). The band index is append-only and keeps
   the bands of every SEEN doc — kept or dropped — so transitive
   duplicate chains keep collapsing onto the earliest occurrence.
2. **segment drop** — surviving docs split into 10-token segments
   (:func:`datapipe.dedup.doc_segments`); segments whose hash is in
   the seen-segment state (or occurs earlier within the batch) drop;
   docs are rebuilt from the survivors.
3. **idempotent append** — rebuilt docs, batch bands, and surviving
   segment hashes union into ONE per-batch state subdirectory
   (``batch=N`` of the single state relation — r11) written with
   OVERWRITE: foreachBatch is at-least-once, so a crashed batch
   replays — overwriting its own directory (and excluding it from
   the state reads) makes the replay a no-op instead of a duplicate,
   i.e. effective exactly-once without a transactional table format.
   An id-order watermark (one JSON line, driver-side) rejects
   genuinely out-of-order batches loudly.

Keep-EARLIEST is the streaming-correct keeper rule: the batch
builds' keep-longest (``dedup_drop_list``) needs the whole cluster
before choosing, so a later, longer duplicate would have to
retroactively un-serve an already-appended keeper — impossible in an
append-only stream. With keep-earliest every decision depends only
on documents with smaller ids, which makes the fold PREFIX-STABLE:
ingesting the corpus in any number of id-ordered micro-batches
produces byte-identical state to one batch over everything (pinned
by ``tests/test_multimodal_streaming.py``), and the registry's
``st7_stream_corpus_ingest`` twin is plain batch SQL.

Scale: per batch the only wide ops are the band equi-join against
the index (partitioned by (band_id, band_hash) — the 65k-value
bucket domain), the segment-hash anti-join (uniform 128-bit key),
and one groupBy per rebuilt doc. State is parquet, append-only,
partitionable; work per batch is ∝ |batch| × hit-rate, never
∝ |corpus|.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
    doc_segments,
    incremental_lsh_pairs,
    keep_first_segment,
    lsh_candidate_pairs,
    minhash_bands,
    rebuild_winners,
)

# r11 (verdict item 1): ONE state relation instead of three. Band
# rows (every seen doc), surviving segment hashes, and rebuilt corpus
# rows share a union schema (each kind's unused columns NULL) and
# land in the SAME per-batch directory with ONE write — the per-batch
# fold runs one state-write job instead of three against a fixed
# ~0.4-0.6 s/job micro-batch floor (guide §1.2/§5: fewer driver
# barriers). Kind dispatch at read time is a NULL test on the kind's
# witness column (band_id / seg_hash / n_kept); the union write emits
# each branch's partitions as separate parquet FILES, so files stay
# kind-pure and IS NOT NULL filters prune whole row groups via
# parquet null-count stats.
_STATE = "ingest_state"


def _p(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _band_kind(bands: DataFrame) -> DataFrame:
    return bands.select(
        "doc_id",
        "band_id",
        "band_hash",
        F.lit(None).cast("binary").alias("seg_hash"),
        F.lit(None).cast("int").alias("n_kept"),
        F.lit(None).cast("string").alias("deduped_text"),
    )


def _seg_kind(segs: DataFrame) -> DataFrame:
    return segs.select(
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("int").alias("band_id"),
        F.lit(None).cast("binary").alias("band_hash"),
        "seg_hash",
        F.lit(None).cast("int").alias("n_kept"),
        F.lit(None).cast("string").alias("deduped_text"),
    )


def _corpus_kind(rebuilt: DataFrame) -> DataFrame:
    return rebuilt.select(
        "doc_id",
        F.lit(None).cast("int").alias("band_id"),
        F.lit(None).cast("binary").alias("band_hash"),
        F.lit(None).cast("binary").alias("seg_hash"),
        "n_kept",
        "deduped_text",
    )


def _batch_p(state_dir: str, name: str, batch_id: int) -> str:
    # one subdirectory per micro-batch, OVERWRITTEN on replay: Spark's
    # foreachBatch is at-least-once, so a crashed batch re-runs — an
    # append sink would duplicate its rows in the state; overwriting
    # the batch's own directory makes every state write idempotent
    # (effective exactly-once without a transactional table format)
    return os.path.join(state_dir, name, f"batch={batch_id}")


def corpus_ingest_batch(
    state_dir: str, seg_tokens: int = 10
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function that folds one micro-batch
    of documents (``doc_id``, ``text``, …) into the corpus state under
    ``state_dir``."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ALL per-batch cuts are LAZY (r6, the r5 lazy-cut rule) and —
        # r11 — the whole fold is ONE state-write job: bands, surviving
        # segment hashes, and rebuilt corpus rows union into the
        # batch's single state directory, so the fixed per-job
        # micro-batch floor is paid once instead of three times. The
        # lazy checkpoints still cut each multi-consumer relation
        # (batch_df, new_bands, kept_docs, kept_segs): within the one
        # job the first stage that computes a pinned relation caches
        # its blocks and later stages read them — two stages racing on
        # a not-yet-cached pin can compute a batch-sized map chain
        # twice (measured small next to the saved job barriers; the
        # work is bounded by ONE batch, never the corpus).
        # the id-bounds ride the write as observe() metrics (r6); the
        # out-of-order check runs right after it and un-writes the
        # batch's single state directory before raising, so a rejected
        # batch leaves NO trace.
        from pyspark.sql import Observation

        batch_df = batch_df.localCheckpoint(eager=False)
        new_bands = minhash_bands(batch_df).localCheckpoint(eager=False)
        # the observation attaches DOWNSTREAM of the lazy checkpoint,
        # on the relation the band-state write scans (a lazy
        # localCheckpoint call emits an empty metrics event, so
        # observing upstream of it yields None bounds — measured).
        # Every doc emits one band row per band, so min/max doc_id
        # over the band table equals min/max over the batch.
        obs = Observation(f"corpus_ingest_bounds_{batch_id}")
        bands_out = new_bands.observe(
            obs, F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        )
        state_path = _p(state_dir, _STATE)
        if os.path.exists(state_path):
            # the index excludes this batch's own (possibly partial)
            # earlier attempt — state reads must not see replay debris
            # — and non-band kinds via the witness column
            index = spark.read.parquet(state_path).filter(
                (F.col("batch") != batch_id) & F.col("band_id").isNotNull()
            ).select("doc_id", "band_id", "band_hash")
            pairs = incremental_lsh_pairs(new_bands, index)
        else:
            # new_bands is already lazily checkpointed above — the
            # default pin would just add a per-batch job
            pairs = lsh_candidate_pairs(new_bands, pin=False)
        # keep-earliest: a pair (a, b) with a < b drops b; with
        # id-ordered arrival the greater side is always in this batch
        dropped = pairs.select(F.col("b").alias("doc_id")).distinct()
        kept_docs = batch_df.join(
            dropped, "doc_id", "left_anti"
        ).localCheckpoint(eager=False)
        # segment text is projected away right after the map-side md5:
        # the seen-state anti-join and the keeper aggregate move only
        # (seg_hash, encoded id·2²¹+idx) — text re-enters via the
        # doc-keyed rebuild join, the same never-shuffle-text shape
        # as the batch twin's segment_dedup
        segs = doc_segments(kept_docs, seg_tokens).select(
            "doc_id", "seg_idx", "seg_hash"
        )
        if os.path.exists(state_path):
            seen = spark.read.parquet(state_path).filter(
                (F.col("batch") != batch_id) & F.col("seg_hash").isNotNull()
            ).select("seg_hash")
            segs = segs.join(seen, "seg_hash", "left_anti")
        kept_segs = keep_first_segment(segs).localCheckpoint(eager=False)
        rebuilt = rebuild_winners(kept_segs, kept_docs, seg_tokens)
        # ONE state write per batch (r11): bands + surviving segment
        # hashes + rebuilt corpus rows union into the batch's directory
        _band_kind(bands_out).unionByName(
            _seg_kind(kept_segs.select("seg_hash"))
        ).unionByName(_corpus_kind(rebuilt)).write.mode("overwrite").parquet(
            _batch_p(state_dir, _STATE, batch_id)
        )
        # keep-earliest assumes id-ordered arrival (docs arrive
        # chronologically, ids assigned monotonically). An
        # out-of-order batch would need to retract an already-appended
        # doc — fail loudly instead of silently producing a different
        # corpus than the batch twin. The watermark is a one-line
        # driver-side file, not a scan of the growing index; the
        # bounds come from the observe() metrics of the state write
        # (the batch's one job), so the check costs no job.
        bounds = obs.get
        wm_path = _p(state_dir, "_id_watermark")
        if bounds["lo"] is not None and os.path.exists(wm_path):
            with open(wm_path) as fh:
                wm = json.load(fh)
            # a REPLAY of this same batch (crash after the watermark
            # write, before the stream checkpoint committed) is legal
            # — the per-batch overwrite makes it idempotent; only a
            # genuinely different, earlier-id batch is an error
            if wm["batch_id"] != batch_id and bounds["lo"] <= wm["hi"]:
                # un-write this batch's single state directory before
                # failing so the rejected batch leaves NO trace
                import shutil

                shutil.rmtree(
                    _batch_p(state_dir, _STATE, batch_id),
                    ignore_errors=True,
                )
                raise ValueError(
                    f"out-of-order ingest: batch {batch_id} min doc_id "
                    f"{bounds['lo']} <= already-indexed max {wm['hi']}; "
                    "keep-earliest dedup requires id-ordered batches"
                )
        if bounds["hi"] is not None:
            # atomic: write-then-rename so a crash mid-write leaves the
            # old complete watermark, never truncated JSON that would
            # wedge the next batch's json.load
            tmp_path = wm_path + ".tmp"
            with open(tmp_path, "w") as fh:
                json.dump({"batch_id": batch_id, "hi": bounds["hi"]}, fh)
            os.replace(tmp_path, wm_path)

    return fn


def run_corpus_ingest_stream(
    spark: SparkSession,
    docs_dir: str,
    schema,
    state_dir: str,
    seg_tokens: int = 10,
    state_partitions: int | str | None = "auto",
) -> DataFrame:
    """Run an AvailableNow documents stream from ``docs_dir`` (one
    micro-batch per file, in file-timestamp order) through
    :func:`corpus_ingest_batch` and return the resulting corpus
    state ``(doc_id, n_kept, deduped_text)``.

    ``state_partitions`` sizes ``spark.sql.shuffle.partitions`` for
    the per-batch fold — the same deployment knob as
    ``run_available_now``: every wide op inside the fold (band probe,
    seen-segment anti-join, keeper aggregate, rebuild groupBy) runs
    over BATCH-sized relations, so task count should track batch
    volume, not CPU count; it also bounds the file count of each
    per-batch state write, which the next batch pays to re-read. The
    default ``"auto"`` resolves the ``$SPARK_GRAFT_STATE_PARTITIONS``
    deployment knob (``streaming.windows.default_state_partitions``).
    The session conf is restored after the bounded run."""
    from enriched_crime_incident_data_pipeline_spark.streaming.windows import (
        default_state_partitions,
    )

    if state_partitions == "auto":
        state_partitions = default_state_partitions()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    # AQE off for the fold (r11): the fold's shuffles are pinned to
    # ``state_partitions`` (nothing for AQE coalescing to do) and AQE
    # materializes every exchange as its own driver job — measured
    # 10-14 → 3-6 jobs per batch, ~0.3-0.8 s/batch at sf0.1; see
    # corpus_refresh.py's runner for the full rationale. Restored
    # after the bounded run.
    prev = None
    prev_aqe = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        q = (
            stream.writeStream.foreachBatch(
                corpus_ingest_batch(state_dir, seg_tokens)
            )
            .option(
                "checkpointLocation", _p(state_dir, f"_ckpt_{uuid.uuid4().hex}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if prev_aqe is not None:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return (
        spark.read.parquet(_p(state_dir, _STATE))
        .filter(F.col("n_kept").isNotNull())
        .select("doc_id", "n_kept", "deduped_text")
    )


def batch_twin(docs: DataFrame, seg_tokens: int = 10) -> DataFrame:
    """The batch-SQL-expressible equivalent of the streamed ingest:
    drop every doc that is the GREATER side of any LSH candidate pair
    (keep-earliest), then corpus-wide segment dedup. Prefix-stability
    of the streaming fold means this equals the stream's final state
    for any id-ordered batch split."""
    from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
        segment_dedup,
    )

    pairs = lsh_candidate_pairs(minhash_bands(docs))
    dropped = pairs.select(F.col("b").alias("doc_id")).distinct()
    return segment_dedup(
        docs.join(dropped, "doc_id", "left_anti"), seg_tokens=seg_tokens
    )
