"""Distributed BPE merge learning (tokenizer training).

Byte-pair-encoding tokenizers (GPT-2's vocab, SentencePiece BPE) are
trained by iterating: count adjacent symbol pairs across the corpus,
merge the most frequent pair everywhere, repeat. The count step is
the scale problem — one row per adjacent symbol occurrence, corpus-
wide — and it is exactly a map-side-combinable groupBy, so each
training round is one explode+groupBy shuffle over O(total tokens)
rows plus a broadcast of the single winning pair. Nothing about the
loop needs a driver-side corpus: the winner is a 1-row relation
cross-joined (broadcast) into the re-segmentation step, and round
lineage is cut with an eager ``localCheckpoint`` per iteration, so
the plan stays flat at any corpus size and any merge count.

Re-segmentation semantics are the standard greedy left-to-right
non-overlapping pass, expressed as a sequential fold over each
document's symbol sequence (the same position-ordered-fold contract
as :mod:`datapipe.lm`, so any ordered-aggregate SQL engine
reproduces it bit-for-bit): the accumulator is the space-joined
output sequence; a symbol that completes the winning pair fuses with
the just-emitted left symbol into ``a + US + b`` (US = unit
separator, a byte the tokenizer alphabet never contains), otherwise
it appends. Because the fused symbol is a *new* string, runs like
``a a a`` under merge ``(a, a)`` greedily produce ``[a·a, a]`` — the
textbook BPE pass — with no special-casing.

Ties on pair frequency break deterministically (count desc, then
pair lexicographic asc), so the learned merge table is reproducible
across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import tokens

SEP = "\x1f"

_PAIRS = (
    "transform(slice(arr, 1, greatest(size(arr) - 1, 0)),"
    " (x, i) -> struct(x AS a, element_at(arr, i + 2) AS b))"
)

# greedy left-to-right merge of the (ma, mb) pair as a sequential
# string fold; `right()` checks that the accumulator's LAST emitted
# symbol is exactly ma (symbols never contain spaces)
_APPLY = f"""
split(aggregate(arr, '', (acc, v) -> CASE
  WHEN acc = '' THEN v
  WHEN v = mb AND acc = ma
    THEN concat(ma, '{SEP}', mb)
  WHEN v = mb AND right(acc, length(ma) + 1) = concat(' ', ma)
    THEN concat(substr(acc, 1, length(acc) - length(ma)),
                ma, '{SEP}', mb)
  ELSE concat(acc, ' ', v) END), ' ')
"""


def adjacent_pair_counts(sym: DataFrame) -> DataFrame:
    """``(a, b, c)`` corpus-wide adjacent-pair frequencies over a
    ``(doc_id, arr)`` symbol relation. One explode + one combinable
    groupBy; no joins."""
    return (
        sym.select(F.explode(F.expr(_PAIRS)).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _train(
    docs: DataFrame,
    iters: int,
    id_col: str,
    text_col: str,
    apply_last: bool,
):
    """Shared training loop → (raw symbols, final symbols, merges)."""
    sym0 = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("arr")
    ).localCheckpoint(eager=True)
    sym = sym0
    merges = None
    for it in range(1, iters + 1):
        top = (
            adjacent_pair_counts(sym)
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .select(
                F.lit(it).alias("it"),
                F.col("a").alias("ma"),
                F.col("b").alias("mb"),
                F.col("c").alias("cnt"),
            )
            .localCheckpoint(eager=True)
        )
        merges = top if merges is None else merges.unionByName(top)
        if it < iters or apply_last:
            sym = (
                sym.crossJoin(F.broadcast(top.select("ma", "mb")))
                .select("doc_id", F.expr(_APPLY).alias("arr"))
                .localCheckpoint(eager=True)
            )
    return sym0, sym, merges


def learn_bpe_merges(
    docs: DataFrame,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(it, a, b, cnt)`` — the first ``iters`` learned merge rules
    in training order. ``a``/``b`` may themselves be fused symbols
    from earlier rounds (joined with the US byte)."""
    _, _, merges = _train(docs, iters, id_col, text_col, apply_last=False)
    return merges.select(
        "it", F.col("ma").alias("a"), F.col("mb").alias("b"), "cnt"
    )


def bpe_encode_lengths(
    docs: DataFrame,
    iters: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer read path: train ``iters`` merges, encode the corpus
    with them, and report ``(doc_id, n_raw, n_bpe)`` sequence lengths
    — the compression audit a tokenizer-training run publishes. The
    encode is the same broadcast-rule greedy fold as training, so
    cost per rule is one map-only pass over the corpus."""
    sym0, sym, _ = _train(docs, iters, id_col, text_col, apply_last=True)
    raw = sym0.select("doc_id", F.size("arr").cast("bigint").alias("n_raw"))
    enc = sym.select("doc_id", F.size("arr").cast("bigint").alias("n_bpe"))
    return raw.join(enc, "doc_id")
