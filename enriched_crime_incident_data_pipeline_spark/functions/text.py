"""Text-analysis column functions for training-data pipelines.

Beyond-parity surface (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting, shingling. All are
built-in column expressions (split / filter / transform / md5 /
regexp) so they run JVM-side at 100 TB with no Python in the hot path,
and every one has an exact ANSI-SQL twin for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword sets per language for the heuristic
# lang-id / stopword-ratio features. Intentionally small and frozen:
# the scoring contract (not linguistic accuracy) is the tested surface.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"],
}


def normalize_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs of
    whitespace, trim. The canonical form used by fingerprinting and
    shingle-based dedup."""
    lowered = F.lower(text)
    cleaned = F.regexp_replace(lowered, r"[^a-z0-9]+", " ")
    return F.trim(cleaned)


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>,
    no empties)."""
    return F.split(normalize_text(text), r" +")


def token_count(text: Column) -> Column:
    """Whitespace token count over normalized text; empty/NULL-safe
    (empty string → 0)."""
    norm = normalize_text(text)
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, r" +")))


def _bind(value: Column, body) -> Column:
    """Evaluate ``value`` once and pass it to ``body`` as a bound
    variable (a let-binding for column expressions).

    Spark has no let; an expression referenced inside a
    higher-order-function lambda is RE-EVALUATED per element, so e.g.
    tokenizing inside a per-shingle-position lambda reruns the
    normalize/split regex once per position. Wrapping the value in a
    1-element array and ``transform``-ing over it binds it to a lambda
    variable — evaluated once, referenced cheaply."""
    return F.transform(F.array(value), body)[0]


def shingles_from_tokens(toks: Column, n: int) -> Column:
    """n-word shingles from an ALREADY-TOKENIZED array column — the
    shared-tokenization half of :func:`word_shingles`, public so a
    query that needs SEVERAL shingle widths (``dd26``) can tokenize
    once and derive every width from the same array instead of
    re-running the normalize/split regex per width. ``toks`` must be
    a cheap reference (a bound column), not a recomputed expression —
    it is referenced inside a per-position lambda."""
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles (array<string>) for MinHash / Jaccard dedup.

    Documents shorter than ``n`` tokens yield a single shingle of all
    their tokens, so every non-empty document has ≥1 shingle.
    """
    return _bind(tokens(text), lambda toks: shingles_from_tokens(toks, n))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-grams of the normalized text (array<string>)."""

    def build(norm: Column) -> Column:
        n_gr = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))
        idx = F.sequence(F.lit(1), n_gr)
        return F.transform(idx, lambda i: F.substring(norm, i, n))

    return _bind(normalize_text(text), build)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint: md5 of the
    normalized text. Exact-dup key that survives whitespace /
    punctuation / case jitter."""
    return F.md5(normalize_text(text))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (double,
    0 for empty docs)."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    total = token_count(text)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax stopword-hit-count across the
    known languages, ties broken by language-code order, 'und' when no
    stopwords hit at all."""
    toks = tokens(text)

    def contains(sw):
        # closure factory: a default-arg lambda would change the
        # lambda's arity, which PySpark inspects for HOF binding
        return lambda t: F.array_contains(sw, t)

    scores = []
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        scores.append((code, F.size(F.filter(toks, contains(sw)))))
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # fold right-to-left so earlier language codes win exact ties
    for code, score in reversed(scores):
        result = F.when((score == best) & (best > 0), F.lit(code)).otherwise(result)
    return result


def quality_features(text: Column) -> dict[str, Column]:
    """Document quality signals: length, token stats, punctuation /
    digit / uppercase ratios, English stopword ratio, and a composite
    [0,1] quality score. Returns a dict of named columns so callers
    select the subset they need (column pruning stays effective)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    mean_token_len = F.when(
        n_tokens > 0,
        F.length(normalize_text(text)).cast("double") / n_tokens - 1.0 + 1.0 / n_tokens,
    ).otherwise(F.lit(0.0))
    # ratio helpers: count chars of a class by deleting the rest
    def class_ratio(pattern: str) -> Column:
        kept = F.length(F.regexp_replace(text, pattern, ""))
        return F.when(
            n_chars > 0, (n_chars - kept).cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0))

    punct_ratio = class_ratio(r"[\.,;:!\?'\"()\[\]{}-]")
    digit_ratio = class_ratio(r"[0-9]")
    upper_ratio = class_ratio(r"[A-Z]")
    sw_ratio = stopword_ratio(text, "en")
    quality = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(sw_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.15
        + (F.lit(1.0) - F.least(digit_ratio * F.lit(4.0), F.lit(1.0))) * 0.15
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_token_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "upper_ratio": upper_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": quality,
    }


# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB oracle): character classes, +, {n} only — no
# backrefs, no lookaround.
PII_EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
PII_PHONE_PATTERN = r"555-[0-9]{4}"


def scrub_pii(text: Column) -> Column:
    """Redact email addresses and 555-xxxx phone numbers from text.

    Training-corpus hygiene step: regex redaction with typed
    placeholders, entirely JVM-side (``regexp_replace``) so it
    runs in whole-stage codegen at corpus scale.
    """
    cleaned = F.regexp_replace(text, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(cleaned, PII_PHONE_PATTERN, "<PHONE>")


def pii_counts(text: Column) -> dict[str, Column]:
    """Redaction audit counts: how many emails / phone numbers a
    document contains (before scrubbing)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_PATTERN)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_PATTERN)),
    }


def repetition_features(doc_grams: "DataFrame") -> "DataFrame":
    """Gopher-style repetition signals from an exploded
    (doc_id, gram) relation: per document, the fraction of gram
    occurrences taken by the single most frequent gram
    (``top_frac``) and the fraction that are repeats of an earlier
    occurrence (``dup_frac`` = 1 - distinct/total, computed as an
    exact integer ratio).

    Two map-side-combinable aggregations on doc_id — no windows, no
    sorts; the gram relation never leaves its (doc_id, gram) shuffle.
    High ``top_frac``/``dup_frac`` flag boilerplate and degenerate
    repetition that per-token quality scores miss.
    """
    per_gram = doc_grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("int").alias("n_grams"),
        F.count("*").cast("int").alias("distinct_grams"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias("top_frac"),
        (
            (F.sum("cnt") - F.count("*")).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("dup_frac"),
    )


def winnow_fingerprint(text: Column, n: int = 5) -> Column:
    """Robust content fingerprint: min 32-bit hash over the character
    ``n``-grams of the normalized text (a 1-hash winnowing sketch).
    Survives local edits that break the exact md5 fingerprint;
    collisions between unrelated docs are ~2⁻³² per pair.

    r11 (guide §1.2 per-task work, ta6 A/B −11%): fused to ONE
    transform — position index → substring → hash, folded by
    ``array_min`` — instead of materializing the gram-string array,
    de-duplicating it (``array_distinct`` over strings compares
    element pairs), and hashing in a second transform. Dropping the
    distinct is free correctness-wise: ``min`` is duplicate-
    insensitive, so the minimum over all grams equals the minimum
    over distinct grams bit-for-bit (the duplicate fraction of
    natural-text char-grams is small, so the few extra md5 calls
    cost less than the distinct + the second array)."""

    def build(norm: Column) -> Column:
        n_gr = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))
        idx = F.sequence(F.lit(1), n_gr)
        return F.array_min(
            F.transform(
                idx,
                lambda i: F.conv(
                    F.substring(F.md5(F.substring(norm, i, n)), 1, 8), 16, 10
                ).cast("long"),
            )
        )

    return _bind(normalize_text(text), build)


# GPT-2-style pretokenizer pattern, restricted to constructs shared by
# Java regex and RE2 (no lookahead — the original's `\s+(?!\S)` is
# replaced by a plain `\s+` alternative, which only changes how
# trailing whitespace runs are grouped). Alternation is
# leftmost-first in both engines, so the split is reproducible.
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_pretokens(text: Column) -> Column:
    """GPT-2-style pretokens of the RAW text (array<string>): leading-
    space-attached word/number/punctuation runs plus split English
    contractions — the segmentation BPE vocabularies are trained over.
    Unlike :func:`tokens` this is case- and punctuation-preserving."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    """Pretoken count — the cheap LLM-token-budget estimator (actual
    BPE merges only split pretokens further, so this lower-bounds the
    real token count at roughly 0.75× for English text)."""
    return F.size(bpe_pretokens(text))
