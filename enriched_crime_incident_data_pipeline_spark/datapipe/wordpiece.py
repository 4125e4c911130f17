"""WordPiece-style greedy longest-match tokenization.

The read-path complement to :mod:`datapipe.bpe`: BPE *learns* a merge
table by iterating over the corpus; WordPiece-style encoders *apply*
a fixed vocabulary with greedy longest-prefix matching per word
(Wu et al. 2016; BERT's tokenizer). Two pieces:

- **Vocabulary induction** (:func:`learn_wordpiece_vocab`): every
  single character seen in the corpus (guarantees the encoder always
  makes progress) plus the top-``k`` most frequent length-2/3
  character substrings, counted corpus-wide. The count pass is one
  explode + map-side-combinable groupBy over O(total chars) rows —
  the same shuffle shape as BPE pair counting — and the top-k is a
  deterministic ``(count desc, piece asc)`` TakeOrdered, so the
  learned vocabulary is reproducible across engines and
  partitionings.

- **Encoding** (:func:`wordpiece_encode`): greedy longest-match is a
  sequential per-word decision process, expressed as a position-
  ordered fold (Spark ``aggregate`` over ``sequence(1, len)``): the
  accumulator carries the next unconsumed position, the piece count,
  and the piece-sequence string; each step consumes the longest
  vocabulary piece (3, then 2, then the always-present single char)
  starting at that position. The fold is a row-local column
  expression — the encode stage is map-only, no shuffle, work
  O(chars·max_piece_len) per row — and bit-reproducible in any
  engine with ordered folds (DuckDB ``list_reduce`` over a struct
  list), which is what lets the tok3 oracle pin the exact
  segmentation, not just counts.

At 100 TB the vocabulary relation is tiny (|alphabet| + k rows) and
rides along as one broadcast array column; the corpus never shuffles
for encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from enriched_crime_incident_data_pipeline_spark.functions.text import tokens

# all substrings of length `n` of each word occurrence, one row
# each. The filter (rather than a shortened sequence) keeps the
# sequence bounds ascending for every word length — Spark's
# sequence(1, 0) counts DOWN.
_SUBSTR_N = (
    "filter(transform(sequence(1, length(w)), p -> substr(w, p, {n})),"
    " s -> length(s) = {n})"
)

# greedy longest-match fold: acc = (next position, pieces emitted,
# piece-sequence string). Single characters are always in the vocab,
# so the ELSE branch guarantees progress.
_ENCODE = """
aggregate(
  sequence(1, length(w)),
  named_struct('np', 1, 'n', 0, 'fp', ''),
  (acc, p) -> CASE
    WHEN p < acc.np THEN acc
    WHEN length(substr(w, p, 3)) = 3 AND array_contains(vocab, substr(w, p, 3))
      THEN named_struct('np', p + 3, 'n', acc.n + 1,
                        'fp', concat(acc.fp, ' ', substr(w, p, 3)))
    WHEN length(substr(w, p, 2)) = 2 AND array_contains(vocab, substr(w, p, 2))
      THEN named_struct('np', p + 2, 'n', acc.n + 1,
                        'fp', concat(acc.fp, ' ', substr(w, p, 2)))
    ELSE named_struct('np', p + 1, 'n', acc.n + 1,
                      'fp', concat(acc.fp, ' ', substr(w, p, 1)))
  END)
"""


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, w) word occurrences in document order, empties
    dropped (an all-separator text normalizes to '' whose split
    yields [''])."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
        )
        .filter(F.length("w") >= 1)
    )


def learn_wordpiece_vocab(
    docs: DataFrame,
    top_k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row DataFrame ``(vocab)`` — a sorted array of vocabulary
    pieces: every single character in the corpus plus the ``top_k``
    most frequent length-2/3 substrings (count desc, piece asc)."""
    words = _words(docs, id_col, text_col)
    singles = (
        words.select(
            F.explode(F.expr(_SUBSTR_N.format(n=1))).alias("piece")
        )
        .distinct()
    )
    multi = (
        words.select(
            F.explode(
                F.concat(
                    F.expr(_SUBSTR_N.format(n=2)),
                    F.expr(_SUBSTR_N.format(n=3)),
                )
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "piece")
        .limit(top_k)
        .select("piece")
    )
    return (
        singles.unionByName(multi)
        .distinct()
        .agg(F.array_sort(F.collect_list("piece")).alias("vocab"))
    )


def wordpiece_encode(
    docs: DataFrame,
    top_k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document encode audit ``(doc_id, n_words, n_pieces, fp)``:
    word count, total greedy-longest-match piece count under the
    induced vocabulary, and an md5 fingerprint of the full piece
    sequence in document order (pinning the exact segmentation, not
    just its length)."""
    vocab = learn_wordpiece_vocab(docs, top_k, id_col, text_col)
    per_word = (
        _words(docs, id_col, text_col)
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "pos", F.expr(_ENCODE).alias("enc"))
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("enc.n").alias("n_pieces"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("enc.fp").alias("fp")))
                        ),
                        lambda s: s["fp"],
                    ),
                )
            ).alias("fp"),
        )
    )
