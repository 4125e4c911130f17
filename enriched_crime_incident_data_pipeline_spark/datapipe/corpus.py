"""Corpus-preparation operators for LLM training-data pipelines.

Beyond-parity surface (BASELINE.json north star, same family as
``datapipe/dedup.py``): the operations a 100 TB pretraining-corpus
build needs between "documents exist" and "tokens reach the trainer":

- :func:`pack_assignments` — concat-and-chunk sequence packing (the
  GPT-style "concatenate the corpus, cut every ``budget`` tokens"
  layout), computed as a *two-phase prefix sum* so no global
  single-partition window ever forms;
- :func:`stratified_sample` — deterministic hash-based per-source
  sampling (reproducible across runs/engines, no RNG state);
- :func:`prune_boilerplate` — drop tokens whose document frequency
  exceeds a threshold (boilerplate/stopword removal) and reassemble
  each document order-preservingly;
- :func:`shuffle_shards` — deterministic global training-order
  shuffle into shards (hash order, not RNG), giving every example a
  stable (shard, position).

Everything is built-in column expressions — no Python in the hot
path — and every op has an exact ANSI-SQL twin in the registry.

Scale notes (100 TB):
- packing's only wide operations are (a) one hash shuffle on the
  value-derived bucket id, (b) per-bucket windows that parallelize
  across buckets, and (c) one window over the *bucket totals* (one
  row per bucket — thousands of rows at cluster scale, trivially
  small). The classic formulation (global ``Window.orderBy(id)``)
  collapses to one partition and is exactly what this avoids.
- sampling and sharding are embarrassingly parallel (pure hash math);
  the shard window parallelizes across ``n_shards``, which at scale
  is sized ≫ executor count.
- boilerplate pruning shuffles tokens once for the DF count and once
  for the reassembly groupBy; the boilerplate set itself is tiny
  (vocabulary-sized) and broadcast into the anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.datapipe.dedup import hash32
from enriched_crime_incident_data_pipeline_spark.functions.text import (
    token_count,
    tokens,
)

PACK_BUDGET = 256
PACK_BUCKETS = 32
SHARD_SALT = "shuffle-v1"


def pack_assignments(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_buckets: int = PACK_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = None,
) -> DataFrame:
    """Assign each document its global token ``start_offset`` and
    ``pack_id`` under concat-and-chunk packing in ``id_col`` order.

    Semantics: lay all documents end-to-end ordered by ``id_col``;
    the corpus token stream is cut every ``budget`` tokens;
    ``pack_id`` is the chunk containing the document's first token.
    (Documents may span chunk boundaries, as in standard LLM
    pretraining packing.)

    Two-phase prefix sum: bucket ids are **value-derived**
    (``floor(id·n_buckets/(max_id+1))``, not physical partition ids),
    so the result is independent of physical partitioning and
    deterministic across runs and engines.

    ``size_col`` (r6): a caller that already carries per-document
    token counts (a corpus materialization with an ``n_tokens``
    column, or segment-dedup arithmetic) names the column here and
    the packing never touches — or even requires — the text column,
    so document text needn't flow into the prefix-sum plan at all.
    """
    sz = (
        F.col(size_col).cast("bigint")
        if size_col is not None
        else token_count(F.col(text_col)).cast("bigint")
    )
    t = docs.select(F.col(id_col), sz.alias("n_tokens"))
    bounds = t.agg(F.max(id_col).alias("_max_id"))
    b = t.crossJoin(F.broadcast(bounds)).withColumn(
        "_bucket",
        F.floor(F.col(id_col) * n_buckets / (F.col("_max_id") + 1)).cast("int"),
    )
    local_w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_local_off", F.coalesce(F.sum("n_tokens").over(local_w), F.lit(0))
    )
    # bucket totals: one row per bucket — the only "global" window runs
    # over this tiny relation, never over the corpus itself
    totals = b.groupBy("_bucket").agg(F.sum("n_tokens").alias("_bucket_total"))
    prefix_w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.withColumn(
        "_bucket_prefix", F.coalesce(F.sum("_bucket_total").over(prefix_w), F.lit(0))
    ).select("_bucket", "_bucket_prefix")
    return (
        local.join(F.broadcast(prefix), "_bucket")
        .withColumn("start_offset", F.col("_bucket_prefix") + F.col("_local_off"))
        .withColumn("pack_id", F.floor(F.col("start_offset") / budget))
        .select(id_col, "n_tokens", "start_offset", "pack_id")
    )


def stratified_sample(
    docs: DataFrame,
    rates_bp: dict[str, int],
    default_bp: int = 1000,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``hash32('sample:' || id) mod 10000 < rate_bp(stratum)``.

    ``rates_bp`` maps stratum value → keep-rate in basis points
    (of 10 000); unlisted strata use ``default_bp``. Hash-based (not
    RNG) so the sample is reproducible across runs, engines, and
    cluster layouts — the property training-data ablations need.
    """
    rate = F.lit(default_bp)
    for k, v in sorted(rates_bp.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    bucket = F.pmod(hash32(F.concat(F.lit("sample:"), F.col(id_col).cast("string"))), F.lit(10000))
    return docs.filter(bucket < rate)


def weighted_sample(
    docs: DataFrame, weight_bp: "Column", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row iff
    ``hash32('wsample:' || id) mod 10000 < weight_bp`` — the row's
    keep probability is its own weight in basis points (clamp to
    [0, 10000] upstream).

    The per-stratum variant is ``stratified_sample``; this lifts the
    rate from a stratum constant to an arbitrary integer column
    (quality-proportional sampling, temperature curricula). Hash-based
    so the sample is a pure function of (id, weight), independent of
    engine, run, or partitioning.
    """
    bucket = F.pmod(
        hash32(F.concat(F.lit("wsample:"), F.col(id_col).cast("string"))),
        F.lit(10000),
    )
    return docs.filter(bucket < weight_bp)


def mixture_sample(
    docs: DataFrame,
    targets_bp: dict[str, int],
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Exact-count corpus-mixture sampling: draw the LARGEST sample
    whose per-source composition matches ``targets_bp`` (basis points
    of the output, Σ ≤ 10000), limited by each source's availability.

    All sizing is integer math inside the engine: per-source caps
    ``(n_s·10⁴) div t_s`` bound the feasible total ``T = min(caps)``;
    quotas are ``(T·t_s) div 10⁴``; each source keeps its ``m_s``
    lowest-md5-hash documents (deterministic — a pure function of the
    doc ids, independent of partitioning). Sources not in the target
    map are excluded.

    Scale: the per-source ``row_number`` parallelizes across sources;
    with FEW huge sources prefer the rate-based cousin
    :func:`stratified_sample` (hash-threshold, no per-stratum rank) —
    same determinism, approximate counts.
    """
    t_bp = None
    for k, v in sorted(targets_bp.items()):
        lit = F.lit(v)
        t_bp = lit if t_bp is None else t_bp
        t_bp = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(t_bp)
    in_target = F.col(stratum_col).isin(*targets_bp.keys())
    scoped = docs.filter(in_target)
    counts = scoped.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("_n")
    ).withColumn("_t_bp", t_bp)
    caps = counts.withColumn(
        "_cap", F.expr("(_n * 10000) DIV _t_bp")
    )
    total = caps.agg(F.min("_cap").alias("_T"))
    quota = caps.crossJoin(F.broadcast(total)).select(
        F.col(stratum_col),
        F.expr("(_T * _t_bp) DIV 10000").alias("_m"),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        hash32(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))),
        id_col,
    )
    ranked = scoped.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quota), stratum_col)
        .filter(F.col("_rk") <= F.col("_m"))
        .select(id_col, stratum_col)
    )


def prune_boilerplate(
    docs: DataFrame,
    df_pct_threshold: int = 79,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove tokens whose document frequency ≥ ``df_pct_threshold``
    percent of the corpus, reassembling each document's remaining
    tokens in their original order.

    The threshold compare is integer math (``df·100 ≥ pct·n_docs``) —
    no float ratio, so engines agree exactly. Returns
    ``(id, n_kept, pruned_text)`` for every input document (documents
    reduced to nothing keep an empty string).
    """
    tok_pos = (
        docs.select(F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"))
        .filter(F.col("tok") != "")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    boiler = (
        tok_pos.groupBy("tok")
        .agg(F.countDistinct(id_col).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("_df") * 100 >= F.lit(df_pct_threshold) * F.col("_n_docs"))
        .select("tok")
    )
    kept = tok_pos.join(F.broadcast(boiler), "tok", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("pruned_text"),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("pruned_text", F.lit("")).alias("pruned_text"),
        )
    )


def sliding_chunks(
    docs: DataFrame,
    chunk_tokens: int = 16,
    stride: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping token windows (RAG /
    context-window chunking): chunk ``i`` covers tokens
    ``[i·stride+1, i·stride+chunk_tokens]``; the last chunk may be
    short; every non-empty document yields ≥ 1 chunk.

    Chunk counts use integer math (``1 + ⌈(n−C)/S⌉``) so engines
    agree exactly. The explode is narrow (no shuffle) — chunking a
    100 TB corpus is a map-only stage.
    """
    toks = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    n_extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = (F.floor((n_extra + F.lit(stride - 1)) / F.lit(stride)) + 1).cast("int")
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc")
    ).filter(F.col("_n") > 0)
    expl = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("_i"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_i") * stride + 1, chunk_tokens)
    return expl.select(
        F.col(id_col),
        F.col("_i").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
    )


def group_sample(
    docs: DataFrame,
    k: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "gs",
) -> DataFrame:
    """Deterministic k-per-group sample: within each group keep the k
    rows with the smallest salted hash — the reproducible equivalent
    of per-group reservoir sampling (hash order ≈ uniform random
    order, but stable across runs/engines; change ``salt`` for an
    independent draw).
    """
    h = hash32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        docs.select(F.col(id_col), F.col(group_col), h.alias("_h"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, group_col)
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 8,
    salt: str = SHARD_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle: every document
    gets a stable ``(shard, position)`` from a salted hash order.

    ``shard = hash mod n_shards``; ``position`` ranks by
    ``(hash, id)`` within the shard (the id tiebreak makes the order
    total). Changing ``salt`` yields an independent permutation —
    epochs reshuffle without materializing anything.
    """
    h = hash32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("position", F.row_number().over(w))
        .select(id_col, "shard", "position")
    )


def budget_select(
    scored: DataFrame,
    budget: int,
    quality_col: str = "mean_inv_prob",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budgeted subset selection: walk the corpus in BEST-first
    quality order (ascending ``quality_col``, id tiebreak) and keep
    the longest prefix whose cumulative token count fits ``budget`` —
    the data-constrained-scaling recipe ("train on the best N tokens
    you have"), cf. quality-pruning setups like DeepMind's
    data-constrained scaling and FineWeb-Edu selection.

    Returns ``(id, n_tokens, cum_tokens)`` for the selected docs,
    where ``cum_tokens`` is the inclusive running total in quality
    order.

    Two-phase prefix sum, same shape as :func:`pack_assignments`: the
    bucket id is value-derived (``floor(quality)`` — monotone in the
    sort key, so bucket boundaries respect the global order), local
    inclusive sums run per bucket, and the only global window runs
    over the per-bucket totals (one row per distinct integer quality
    — a tiny relation). No corpus-sized single-partition window.
    """
    b = scored.withColumn(
        "_bucket", F.floor(F.col(quality_col)).cast("bigint")
    )
    local_w = (
        Window.partitionBy("_bucket")
        .orderBy(quality_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_local_incl", F.sum(tokens_col).over(local_w))
    totals = b.groupBy("_bucket").agg(F.sum(tokens_col).alias("_bt"))
    prefix_w = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.withColumn(
        "_bp", F.coalesce(F.sum("_bt").over(prefix_w), F.lit(0))
    ).select("_bucket", "_bp")
    return (
        local.join(F.broadcast(prefix), "_bucket")
        .withColumn(
            "cum_tokens", (F.col("_bp") + F.col("_local_incl")).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, tokens_col, "cum_tokens")
    )


def global_order_index(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    index_col: str = "global_pos",
) -> DataFrame:
    """Dense 1-based global row number over a TOTAL order — the
    ``row_number() OVER (ORDER BY ...)`` that curriculum ordering,
    total-order sharding, and deterministic external sampling need —
    computed without a corpus-wide single-partition window.

    Same two-phase shape as :func:`pack_assignments` /
    :func:`budget_select`: ``bucket`` must be a DETERMINISTIC column
    expression monotone non-decreasing in the order key (e.g.
    ``floor(score * k)`` for a float score — pick ``k`` so one bucket
    holds a bounded slice of the corpus). Local ``row_number`` runs
    per bucket (parallel across buckets, each bounded by bucket
    size); bucket counts (one row per distinct bucket value — tiny)
    are prefix-summed and broadcast back, so
    ``index = bucket_offset + local_rank`` is the exact global rank.

    A value-derived bucket — not ``repartitionByRange`` +
    ``spark_partition_id`` — keeps every branch of the plan
    deterministic: range boundaries are SAMPLED per execution, so a
    plan that reads the ranged exchange twice silently misnumbers
    rows if exchange reuse ever fails; a value bucket re-executes to
    the same answer by construction. ``order_cols`` must end with a
    unique tiebreak column (ties rank nondeterministically
    otherwise).
    """
    cols = [F.col(c) for c in order_cols]
    b = df.withColumn("_bucket", bucket)
    w = Window.partitionBy("_bucket").orderBy(*cols)
    local = b.withColumn("_local_rn", F.row_number().over(w))
    totals = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0))
    ).select("_bucket", "_off")
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            index_col, (F.col("_off") + F.col("_local_rn")).cast("bigint")
        )
        .drop("_bucket", "_local_rn", "_off")
    )


def temperature_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-flattened mixture sampling at T=2 (the
    multilingual/domain rebalancing move — sample sources
    ∝ n_s^(1/T) so big sources stop drowning small ones): each
    source keeps documents at rate ``sqrt(n_min / n_s)``, so the
    expected output composition is ∝ sqrt(n_s) and the smallest
    source keeps everything.

    Rate-based like :func:`stratified_sample` — keep iff
    ``hash32("temp:" + id) < floor(rate_s · 2^32)`` — so selection is
    a pure function of the doc id (partitioning-independent, no RNG
    state) and there is no per-stratum rank window. The rate is one
    double sqrt of an integer ratio; IEEE sqrt and division are
    correctly rounded, so the threshold integer — and therefore the
    kept SET — is bit-identical in any engine (T=2 is fixed
    precisely because general ``pow(x, 1/T)`` carries no such
    guarantee). Scale: one count per source (map-side combinable),
    thresholds broadcast back, keep-filter map-only.
    """
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(F.broadcast(nmin)).select(
        stratum_col,
        F.floor(
            F.sqrt(F.col("_nmin").cast("double") / F.col("_n").cast("double"))
            * F.lit(4294967296.0)
        ).alias("_thr"),
    )
    h = hash32(F.concat(F.lit("temp:"), F.col(id_col).cast("string")))
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .filter(h < F.col("_thr"))
        .select(id_col, stratum_col)
    )


def domain_upsample(
    docs: DataFrame,
    repeat_bp: dict[str, int],
    id_col: str = "doc_id",
    stratum_col: str = "source",
    salt: str = "up",
) -> DataFrame:
    """Deterministic UPSAMPLING with replacement — the mixture move
    :func:`mixture_sample` can't express: repeat high-value sources
    fractionally (e.g. 25 000 bp = every doc 2.5× in expectation —
    2 copies always, a 3rd iff its salted hash falls under the
    fraction). The multi-epoch counterpart of stratified DOWNsampling
    used by every LLM mixture recipe that repeats small curated
    sources against a large web crawl.

    Copies materialize as a narrow ``explode(sequence(...))`` — one
    map-only stage, no shuffle, no RNG: multiplicity is a pure
    function of (id, rate), so the sample is reproducible across
    engines/partitionings, and ``copy_idx`` gives each clone a
    stable identity for downstream shard shuffling. Sources not in
    ``repeat_bp`` pass through at 1×."""
    rate = F.lit(10000)
    for k, v in sorted(repeat_bp.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    frac_hit = (
        F.pmod(
            hash32(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            F.lit(10000),
        )
        < F.pmod(rate, F.lit(10000))
    )
    # integer floor via subtract-the-remainder (a float divide could
    # land on the wrong side of a boundary only within ~1 ulp, but an
    # exact-multiple divide is always exact — and DuckDB's // agrees)
    whole = (rate - F.pmod(rate, F.lit(10000))) / F.lit(10000)
    n_copies = whole.cast("bigint") + frac_hit.cast("bigint")
    return (
        docs.select(
            F.col(id_col), F.col(stratum_col), n_copies.alias("_n")
        )
        .filter(F.col("_n") >= 1)
        .select(
            id_col,
            stratum_col,
            F.explode(F.sequence(F.lit(0), (F.col("_n") - 1).cast("int"))).alias(
                "copy_idx"
            ),
        )
    )


def weighted_sample_k(
    docs: DataFrame,
    k: int,
    tier: "Column",
    id_col: str = "doc_id",
    max_tier: int = 4,
    salt: str = "es:",
) -> DataFrame:
    """EXACT-size weighted sampling without replacement — the
    mixture-building primitive ``weighted_sample`` (Bernoulli,
    independent keeps, random size) and ``tp6`` (per-group top-k by
    unweighted hash) don't cover: draw exactly ``k`` rows where a
    row's selection pressure is proportional to its weight, via
    Efraimidis–Spirakis (2006) exponential keys — key_i =
    u_i^(1/w_i) with u_i uniform, keep the k LARGEST keys; one pass,
    embarrassingly parallel, global top-k (TakeOrdered — never a
    full sort at scale, Spark's sort+limit physical plan keeps only
    k rows per partition).

    Exactness move (the ts7/st20 powers-of-two trick applied to E-S):
    weights are TIERS ``w = 2^t``, ``t = clamp(tier, 0, max_tier)``,
    so the key is ``sqrt`` applied ``t`` times to ``u`` — and IEEE
    754 REQUIRES correctly-rounded sqrt, so keys are bit-identical
    in the JVM, numpy, Python, and DuckDB (a fractional ``pow`` or a
    log-space key would not be: ``ln``/``pow`` carry no such
    guarantee). ``u = (hash32(salt || id) + 1) / 2^32`` — an exact
    dyadic rational in (0, 1], a pure function of the id, so the
    sample is independent of engine, run, and partitioning. Ties
    (astronomically rare) break by id ascending.

    Returns the selected rows' ``(id, tier t, es_key)``."""
    t, key = es_key_exprs(tier, id_col, max_tier, salt)
    return (
        docs.select(
            F.col(id_col),
            t.alias("tier"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col(id_col))
        .limit(k)
    )


def es_key_exprs(
    tier: "Column",
    id_col: str = "doc_id",
    max_tier: int = 4,
    salt: str = "es:",
) -> tuple:
    """The (tier, es_key) column expressions behind
    :func:`weighted_sample_k`, exposed so the STREAMING twin (st22)
    computes bit-identical keys statelessly per arriving row — E-S
    keys make sampling-without-replacement mergeable (the top-k of a
    union is the top-k of the per-part top-ks), which is the whole
    streaming story."""
    t = F.least(
        F.greatest(tier.cast("int"), F.lit(0)), F.lit(max_tier)
    )
    u = (
        hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(4294967296.0)
    key = u
    out = F.when(t == 0, key)
    for ti in range(1, max_tier + 1):
        key = F.sqrt(key)
        out = out.when(t == ti, key)
    return t, out
