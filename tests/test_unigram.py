"""Unigram-LM tokenizer (datapipe/unigram.py): Viterbi optimality vs
brute-force enumeration, deterministic tie-breaks, train invariance
under partitioning, and the encode join-back shape."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from enriched_crime_incident_data_pipeline_spark.datapipe.unigram import (
    _probs,
    learn_unigram_vocab,
    unigram_encode,
    viterbi_segment,
)

SETTINGS = dict(max_examples=25, deadline=None)


def _segmentations(word, vocab, max_len):
    """All segmentations of ``word`` into vocab pieces ≤ max_len."""
    n = len(word)
    outs = []

    def rec(i, acc):
        if i == n:
            outs.append(list(acc))
            return
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i : i + ln]
            if piece in vocab:
                acc.append(piece)
                rec(i + ln, acc)
                acc.pop()

    rec(0, [])
    return outs


def _score(pieces, probs):
    s = 1.0
    for p in pieces:
        s = s * probs[p]
    return s


@given(
    word=st.text(alphabet="ab", min_size=1, max_size=8),
    extra=st.lists(
        st.tuples(st.text(alphabet="ab", min_size=2, max_size=4), st.integers(1, 9)),
        max_size=4,
    ),
)
@settings(**SETTINGS)
def test_viterbi_is_optimal_and_reconstructs(word, extra):
    counts = {"a": 3, "b": 2}
    for piece, c in extra:
        counts.setdefault(piece, c)
    probs = _probs(counts)
    got = viterbi_segment(word, probs)
    # reconstruction + validity
    assert "".join(got) == word
    assert all(p in probs for p in got)
    # optimality: the DP's score equals the brute-force max product
    best = max(
        _score(s, probs) for s in _segmentations(word, set(probs), 4)
    )
    assert _score(got, probs) == best


def test_viterbi_tie_breaks_to_longest_piece():
    # p(ab)·p(c) == p(a)·p(bc) by construction: equal-score paths must
    # resolve to the LONGEST final piece — the longest-first
    # strict-> scan ('abc' itself is kept out of the vocab)
    probs = {"a": 0.25, "b": 0.25, "c": 0.25, "ab": 0.125, "bc": 0.125}
    assert _score(["ab", "c"], probs) == _score(["a", "bc"], probs)
    assert viterbi_segment("abc", probs) == ["a", "bc"]
    # and at the first position, 'ab' wins over 'a'+'b' when equal
    probs2 = {"a": 0.5, "b": 0.5, "ab": 0.25, "c": 0.125}
    assert _score(["ab"], probs2) == _score(["a", "b"], probs2)
    assert viterbi_segment("ab", probs2) == ["ab"]


def test_train_is_partitioning_invariant(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            [
                "the cat sat on the mat",
                "the dog sat on the log",
                "cats and dogs and logs",
                "mat cat dog log the the",
            ]
            * 3
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        tuple(r) for r in learn_unigram_vocab(docs, rounds=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in learn_unigram_vocab(
            docs.repartition(7), rounds=2
        ).collect()
    )
    assert a == b
    # singles always survive the prune; every piece ≤ 4 chars
    pieces = {p for p, _, _ in a}
    assert {c for w in "thecatsatonmatdoglogandcats" for c in w} <= pieces
    assert all(1 <= len(p) <= 4 for p in pieces)


def test_encode_matches_python_model(spark):
    rows = [
        (0, "aa bb aabb"),
        (1, "bb aa"),
        (2, "---"),  # normalizes to empty: NO output row (groupBy twin)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in unigram_encode(docs, seed_k=5, keep_k=3, rounds=1).collect()
    }
    assert set(out) == {0, 1}
    assert out[0][0] == 3 and out[1][0] == 2
    # n_pieces consistency with the model: re-derive via the public
    # train surface (vocab counts) + viterbi_segment
    vocab = {
        r["piece"]: r["cnt"]
        for r in learn_unigram_vocab(
            docs, seed_k=5, keep_k=3, rounds=1
        ).collect()
    }
    probs = _probs(vocab)
    model = {
        0: sum(len(viterbi_segment(w, probs)) for w in ["aa", "bb", "aabb"]),
        1: sum(len(viterbi_segment(w, probs)) for w in ["bb", "aa"]),
    }
    assert {k: v[1] for k, v in out.items()} == model


def test_dq6_tv_drift_hand_computed(spark):
    # two sources, hand-computable TV: srcA = {a:2, b:2} (N_s=4),
    # srcB = {a:4} (N_s=4), corpus c = {a:6, b:2}, N=8.
    # p_A = (1/2, 1/2), q = (3/4, 1/4) → TV_A = (1/4+1/4)/2 = 1/4
    # p_B = (1, 0)                     → TV_B = (1/4+1/4)/2 = 1/4
    # drift_bp = 2500 for both
    from enriched_crime_incident_data_pipeline_spark.registry.quality import (
        q_dq6_token_drift,
    )
    from enriched_crime_incident_data_pipeline_spark.sources import catalog

    docs = spark.createDataFrame(
        [
            (0, "a a b b", "srcA"),
            (1, "a a a a", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    import enriched_crime_incident_data_pipeline_spark.registry.quality as q

    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, n: docs
        q.load_table = catalog.load_table
        out = {
            r["source"]: (r["n_tokens"], r["drift_bp"])
            for r in q_dq6_token_drift(spark, "ignored").collect()
        }
    finally:
        catalog.load_table = orig
        q.load_table = orig
    assert out == {"srcA": (4, 2500), "srcB": (4, 2500)}
