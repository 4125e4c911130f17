"""Streaming-native corpus refresh: the incremental version of the
batch refresh report (``registry.q_corpus_refresh1``).

The batch refresh answers, for every ARRIVING doc, "what is your
admission verdict against the standing corpus?" (exact_dup >
near_dup_old > near_dup_new > contaminated > kept).  The lakehouse
shape real pipelines run is not a nightly batch recompute but the
st7 ingest feeding this refresh incrementally: arriving documents
stream in id-ordered micro-batches, and each batch is judged against

1. **static old-fingerprint state** — the standing corpus's distinct
   normalized-text md5s, written once at stream start (dc2's
   mechanism; a semi-join per batch, |old| never rescanned as text);
2. **the growing band index** — seeded with the standing corpus's
   MinHash bands and appended per batch (dd12's mechanism via
   :func:`datapipe.dedup.incremental_lsh_pairs`: batch bands probe
   the index, work ∝ |batch| × hit-rate, the corpus NEVER
   self-joins).  A pair whose smaller id is old flags near_dup_old;
   a pair whose smaller id is new flags near_dup_new — with
   id-ordered arrival the smaller side is always already indexed (or
   in the same batch), so the greater side is always judged in its
   own batch: the fold is PREFIX-STABLE and the final verdict table
   is byte-identical to the batch refresh for any id-ordered split
   (pinned by ``test_multimodal_streaming.py`` and the shared
   ``corpus_refresh1`` oracle of ``st28_stream_corpus_refresh``);
3. **static eval-gram state** — the eval set's 8-gram frozenset,
   collected ONCE at stream start and re-broadcast per batch (dc6's
   mechanism: benchmarks are MBs by definition; the stream never
   shuffles for decontamination).

Unlike the st7 ingest (which rebuilds corpus text), the refresh is a
pure CLASSIFIER: per batch it writes one verdict row per arriving
doc plus the batch's bands — both into per-batch ``batch=N``
subdirectories with OVERWRITE, so an at-least-once foreachBatch
replay is idempotent (st7's effective-exactly-once trick), and state
reads exclude the replaying batch's own debris.  State size is the
band index (∝ docs seen × bands/doc, the same artifact dd12 already
persists) plus the two static side inputs — bounded by index size,
never by stream length.

Scale: per batch the only wide ops are the band equi-join against
the index (65k-value bucket domain), the fingerprint semi-join
(broadcast-sized: distinct md5s of the standing corpus), and the
verdict left-joins over BATCH-sized relations.  The out-of-order
guard is the st7 id-watermark: bounds ride the band write's
``observe()`` metrics, so the check costs no extra job.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import (
    incremental_lsh_pairs,
    minhash_bands,
)
from enriched_crime_incident_data_pipeline_spark.datapipe.decontaminate import (
    doc_ngrams,
    with_contamination_flag,
)
from enriched_crime_incident_data_pipeline_spark.functions.text import (
    doc_fingerprint,
)

_BANDS = "band_index"
_VERDICTS = "verdicts"
_OLD_FPS = "old_fps"


def _p(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _batch_p(state_dir: str, name: str, batch_id: int) -> str:
    return os.path.join(state_dir, name, f"batch={batch_id}")


def corpus_refresh_batch(
    state_dir: str, cutoff: int, eval_grams: frozenset, ngram: int = 8
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function that classifies one
    micro-batch of arriving documents against the refresh state under
    ``state_dir``.  ``cutoff`` is the standing-corpus id boundary
    (ids < cutoff are the old corpus); ``eval_grams`` is the
    pre-collected static eval n-gram set."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from pyspark.sql import Observation

        batch_df = batch_df.localCheckpoint(eager=False)
        new_bands = minhash_bands(batch_df).localCheckpoint(eager=False)
        obs = Observation(f"corpus_refresh_bounds_{batch_id}")
        bands_out = new_bands.observe(
            obs, F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        )
        # the index always exists (seeded with the old corpus's bands
        # at stream start); exclude this batch's own possibly-partial
        # replay debris
        index = (
            spark.read.parquet(_p(state_dir, _BANDS))
            .filter(F.col("batch") != batch_id)
            .drop("batch")
        )
        pairs = incremental_lsh_pairs(new_bands, index)
        near_old = (
            pairs.filter((F.col("a") < cutoff) & (F.col("b") >= cutoff))
            .select(F.col("b").alias("doc_id"))
            .distinct()
            .withColumn("_no", F.lit(1))
        )
        near_new = (
            pairs.filter(F.col("a") >= cutoff)
            .select(F.col("b").alias("doc_id"))
            .distinct()
            .withColumn("_nn", F.lit(1))
        )
        old_fps = spark.read.parquet(_p(state_dir, _OLD_FPS))
        exact_ids = (
            batch_df.select(
                "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
            )
            .join(old_fps, "fingerprint", "left_semi")
            .select("doc_id")
            .withColumn("_e", F.lit(1))
        )
        contam = (
            with_contamination_flag(
                batch_df.select("doc_id", "text"),
                eval_docs=None,
                n=ngram,
                eval_grams=eval_grams,
            )
            .filter(F.col("contaminated") == 1)
            .select("doc_id")
            .withColumn("_c", F.lit(1))
        )
        verdicts = (
            batch_df.select("doc_id")
            .join(exact_ids, "doc_id", "left")
            .join(near_old, "doc_id", "left")
            .join(near_new, "doc_id", "left")
            .join(contam, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("_e") == 1, F.lit("exact_dup"))
                .when(F.col("_no") == 1, F.lit("near_dup_old"))
                .when(F.col("_nn") == 1, F.lit("near_dup_new"))
                .when(F.col("_c") == 1, F.lit("contaminated"))
                .otherwise(F.lit("kept"))
                .alias("verdict"),
            )
        )
        bands_out.write.mode("overwrite").parquet(
            _batch_p(state_dir, _BANDS, batch_id)
        )
        # id-watermark out-of-order guard (st7's): a smaller-id batch
        # after a larger one would need to retro-flag already-emitted
        # verdicts — fail loudly, un-writing this batch's band state
        bounds = obs.get
        wm_path = _p(state_dir, "_id_watermark")
        if bounds["lo"] is not None and os.path.exists(wm_path):
            with open(wm_path) as fh:
                wm = json.load(fh)
            if wm["batch_id"] != batch_id and bounds["lo"] <= wm["hi"]:
                shutil.rmtree(
                    _batch_p(state_dir, _BANDS, batch_id), ignore_errors=True
                )
                raise ValueError(
                    f"out-of-order refresh: batch {batch_id} min doc_id "
                    f"{bounds['lo']} <= already-indexed max {wm['hi']}; "
                    "prefix-stable verdicts require id-ordered batches"
                )
        verdicts.write.mode("overwrite").parquet(
            _batch_p(state_dir, _VERDICTS, batch_id)
        )
        if bounds["hi"] is not None:
            tmp_path = wm_path + ".tmp"
            with open(tmp_path, "w") as fh:
                json.dump({"batch_id": batch_id, "hi": bounds["hi"]}, fh)
            os.replace(tmp_path, wm_path)

    return fn


def run_corpus_refresh_stream(
    spark: SparkSession,
    new_docs_dir: str,
    schema,
    state_dir: str,
    old_docs: DataFrame,
    eval_docs: DataFrame,
    cutoff: int,
    ngram: int = 8,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Seed the refresh state from ``old_docs`` (band index +
    fingerprint set) and ``eval_docs`` (static gram set), run an
    AvailableNow stream of arriving documents from ``new_docs_dir``
    through :func:`corpus_refresh_batch`, and return the accumulated
    verdict table ``(doc_id, verdict)`` — one row per arriving doc,
    pinned ≡ the batch refresh (``q_corpus_refresh1``) for any
    id-ordered split."""
    # seed: old bands under batch=-1 (a real batch id is ≥ 0, so the
    # replay-exclusion filter never drops the seed), old fingerprints
    # as the static semi-join side, eval grams collected ONCE
    minhash_bands(old_docs).write.mode("overwrite").parquet(
        _batch_p(state_dir, _BANDS, -1)
    )
    old_docs.select(
        doc_fingerprint(F.col("text")).alias("fingerprint")
    ).distinct().write.mode("overwrite").parquet(_p(state_dir, _OLD_FPS))
    eval_grams = frozenset(
        r[0]
        for r in doc_ngrams(eval_docs, ngram).select("gram").distinct().collect()
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(new_docs_dir)
    )
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(
                corpus_refresh_batch(state_dir, cutoff, eval_grams, ngram)
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
    return spark.read.parquet(_p(state_dir, _VERDICTS)).drop("batch")
