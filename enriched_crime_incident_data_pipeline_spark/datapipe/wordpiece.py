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

- **Encoding** (:func:`wordpiece_encode`): greedy longest-match per
  word. Two interchangeable implementations, pinned equal by
  ``tests/test_text_pipeline.py``:

  * **Arrow kernel (default)** — the tiny vocabulary (|alphabet| + k
    pieces) is pulled once and closed over by a ``mapInPandas``
    kernel that walks each document's token array in Python: O(chars)
    per document, one map-only stage, NO shuffle at all (the
    expression path explodes words and re-groups by doc — a corpus-
    wide shuffle the kernel simply deletes). This is the 100 TB read
    path.
  * **Column-expression fold** (``use_kernel=False``) — a position-
    ordered ``aggregate`` fold whose accumulator carries the next
    unconsumed position, the piece count, and the piece-sequence
    string. Bit-reproducible in any engine with ordered folds (DuckDB
    ``list_reduce``), which is what lets the tok3 oracle pin the
    exact segmentation, not just counts. Quadratic in word length
    (string-accumulator copies) — oracle twin, not the hot path.

At 100 TB the vocabulary relation is tiny and rides along as one
closure/broadcast; the corpus never shuffles for encoding.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

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
# so the ELSE branch guarantees progress. Quadratic in word length
# (accumulator string copy per step) — kept as the oracle-shaped
# twin; the Arrow kernel is the linear production path.
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


def encode_word(w: str, vocab: frozenset) -> list:
    """Greedy longest-match pieces of one word — the Python model of
    ``_ENCODE``, O(len(w)) with an output list (no string fold)."""
    out: list = []
    p, n = 0, len(w)
    while p < n:
        if w[p : p + 3] in vocab and p + 3 <= n:
            out.append(w[p : p + 3])
            p += 3
        elif w[p : p + 2] in vocab and p + 2 <= n:
            out.append(w[p : p + 2])
            p += 2
        else:
            out.append(w[p])
            p += 1
    return out


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
    most frequent length-2/3 substrings (count desc, piece asc).

    Counted via the word histogram (r6, the Sennrich reduction the
    BPE trainer already uses): substring counts over the corpus equal
    substring counts over DISTINCT words weighted by word frequency,
    because substrings never cross word boundaries. The corpus is
    scanned/shuffled once (a map-side-combinable word groupBy); the
    substring explode then runs over the Zipf-small distinct-word
    relation instead of per occurrence — at 100 TB the per-occurrence
    substring explode (≈5 rows/char) was the dominant shuffle of
    vocab induction, and it is gone. Counts are integers, so the
    learned vocabulary is bit-identical to the per-occurrence count
    (pinned by the tok3 oracle and the expression-twin test)."""
    whist = (
        _words(docs, id_col, text_col)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    singles = (
        whist.select(
            F.explode(F.expr(_SUBSTR_N.format(n=1))).alias("piece")
        )
        .distinct()
    )
    multi = (
        whist.select(
            "freq",
            F.explode(
                F.concat(
                    F.expr(_SUBSTR_N.format(n=2)),
                    F.expr(_SUBSTR_N.format(n=3)),
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("c"))
        .orderBy(F.desc("c"), "piece")
        .limit(top_k)
        .select("piece")
    )
    return (
        singles.unionByName(multi)
        .distinct()
        .agg(F.array_sort(F.collect_list("piece")).alias("vocab"))
    )


def _encode_kernel(sym: DataFrame, vocab: frozenset) -> DataFrame:
    """Map-only whole-document encode over ``(doc_id, arr)``: per-word
    greedy longest-match, doc-level piece count and segmentation
    fingerprint computed in the same pass. No shuffle.

    Vectorized (r6, the bpe factorize playbook): the batch flattens
    to ONE object array, ``pd.factorize`` dictionary-encodes word
    occurrences, and the greedy walk runs once per DISTINCT word
    (cross-batch memo; Zipf keeps the distinct set small). All
    per-OCCURRENCE work — piece-count sums, fragment gathers, word
    counts — is numpy (``bincount``/fancy indexing), which removes
    the per-token Python loop that was the last visible linear
    Python term in the tokenizer family (200 k-token docs: 2.07 →
    ~1.2 s in tools/longdoc_bench.py). Per-doc piece sums ride
    ``bincount`` weights: float64 adds of integers, exact below 2^53
    (a 2^53-piece document does not exist)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        memo: dict = {}
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "n_words": pd.Series(dtype="int64"),
                "n_pieces": pd.Series(dtype="int64"),
                "fp": pd.Series(dtype="object"),
            }
        )
        for pdf in batches:
            ndocs = len(pdf)
            if ndocs == 0:
                yield empty
                continue
            seqs = [np.asarray(a, dtype=object) for a in pdf["arr"]]
            doclen = np.fromiter(
                (s.size for s in seqs), dtype=np.int64, count=ndocs
            )
            flat = (
                np.concatenate(seqs)
                if doclen.sum() > 0
                else np.empty(0, dtype=object)
            )
            doc_of = np.repeat(np.arange(ndocs), doclen)
            if flat.size:
                # drop empty words (tokens() of an all-separator text)
                lens = np.fromiter(
                    (len(w) for w in flat), dtype=np.int64, count=flat.size
                )
                keep = lens > 0
                if not keep.all():
                    flat = flat[keep]
                    doc_of = doc_of[keep]
            codes, uniq = pd.factorize(flat)
            n_p = np.empty(len(uniq), dtype=np.int64)
            frags = np.empty(len(uniq), dtype=object)
            for i, w in enumerate(uniq):
                hit = memo.get(w)
                if hit is None:
                    pieces = encode_word(w, vocab)
                    hit = (len(pieces), "".join(" " + p for p in pieces))
                    memo[w] = hit
                n_p[i], frags[i] = hit
            n_words = np.bincount(doc_of, minlength=ndocs)
            if codes.size:
                n_pieces = np.bincount(
                    doc_of,
                    weights=n_p[codes].astype(np.float64),
                    minlength=ndocs,
                ).astype(np.int64)
                word_fps = frags[codes]
            else:
                n_pieces = np.zeros(ndocs, dtype=np.int64)
                word_fps = np.empty(0, dtype=object)
            offs = np.concatenate(([0], np.cumsum(n_words)))
            sel = np.flatnonzero(n_words > 0)
            if sel.size == 0:
                yield empty  # groupBy twin emits no row for wordless docs
                continue
            fps = [
                hashlib.md5(
                    "|".join(word_fps[offs[d] : offs[d + 1]]).encode("utf-8")
                ).hexdigest()
                for d in sel
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[sel],
                    "n_words": n_words[sel],
                    "n_pieces": n_pieces[sel],
                    "fp": fps,
                }
            )

    return sym.mapInPandas(
        gen, "doc_id bigint, n_words bigint, n_pieces bigint, fp string"
    )


def wordpiece_encode(
    docs: DataFrame,
    top_k: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_kernel: bool = True,
) -> DataFrame:
    """Per-document encode audit ``(doc_id, n_words, n_pieces, fp)``:
    word count, total greedy-longest-match piece count under the
    induced vocabulary, and an md5 fingerprint of the full piece
    sequence in document order (pinning the exact segmentation, not
    just its length)."""
    vocab = learn_wordpiece_vocab(docs, top_k, id_col, text_col)
    if use_kernel:
        # k-row vocab pull (tiny, deterministic) → closure; the
        # corpus-side plan is a single map-only stage.
        vset = frozenset(vocab.collect()[0]["vocab"])
        sym = docs.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("arr")
        )
        return _encode_kernel(sym, vset)
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
