"""Text-analysis column functions — language ID, quality scoring, token
counting, fingerprinting — all as JVM-side builtin expressions (split /
regexp / md5 / transform). No Python UDFs: at 100 TB these run inside
whole-stage codegen over the document scan.

Every function has an exact ANSI-SQL twin in ``oracles.py`` so the driver's
DuckDB differential check covers them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed marker lexicons for the n-gram/stopword language heuristic.
# Deterministic and tiny by design — the operator's job is scalable scoring,
# not model quality; swap lexicons freely.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "las", "una", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "as", "by", "at", "it", "that", "this",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space split; empty tokens preserved so
    the SQL twin ``string_split(text, ' ')`` agrees)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def word_occurrences(col: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole token, via array filtering (exact
    SQL twin: len(list_filter(string_split(...), t -> t = word)))."""
    return F.size(F.filter(tokens(col), lambda t: t == F.lit(word)))


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def repetition_ratio(col: Column) -> Column:
    """1 - distinct/total tokens: high ⇒ boilerplate/spammy repetition."""
    toks = tokens(col)
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def digit_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, "[0-9]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(
        F.length(col), F.lit(1)
    )


def mean_token_length(col: Column) -> Column:
    """Mean token character length, computed arithmetically: tokens are the
    split on SINGLE spaces, so total token chars = length(text) − (n−1)
    separators exactly (verified bit-identical to the former
    ``aggregate(toks, 0, acc + length(t))`` fold on every fixture doc —
    that interpreted HOF lambda was per-token work the projection doesn't
    need). A regexp_count rewrite of the token-SET counters below was a
    negative A/B (sf1 warm: 4.6s regex vs 2.9s HOF filter — Java
    backtracking alternation loses to the array filter), so those stay."""
    toks = tokens(col)
    n = F.size(toks)
    return (F.length(col) - (n - F.lit(1))) / F.greatest(n, F.lit(1))


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-token hit count per language."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: lowercase, strip non-alphanumerics to
    single spaces, trim, md5. Near-identical formatting variants collapse to
    one key — the exact-dedup hash."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "), " +", " ")
    )
    return F.md5(norm)


def ngram_arrays(
    docs, n: int = 3, text_col: str = "text", out_col: str = "grams"
):
    """DataFrame-level word n-gram builder — the FAST path: spark.ml's
    ``NGram`` transformer slides the window in JVM Scala code, measured
    ~20× faster than the interpreted HOF in ``shingles`` (whose
    element_at/concat_ws lambda tree is evaluated per gram per row).
    Output grams are space-joined, byte-identical to ``shingles`` on every
    fixture doc and edge case (short/empty/multi-space text: NGram on the
    empty-token-preserving split yields the same arrays, incl. [] under n
    tokens). Keeps every non-text column; duplicates preserved — wrap in
    ``array_distinct`` for set semantics."""
    from pyspark.ml.feature import NGram

    toks = docs.withColumn("_toks", tokens(F.col(text_col))).drop(text_col)
    return (
        NGram(n=n, inputCol="_toks", outputCol=out_col)
        .transform(toks)
        .drop("_toks")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (duplicates preserved; wrap in
    array_distinct for set semantics). Documents with < n tokens get an
    empty array. 1-based element_at matches DuckDB list indexing.

    NOTE: this Column form is the slow path (interpreted array-HOF lambda
    per gram) — operators on the documents hot path use ``ngram_arrays``
    (JVM NGram, ~20×); this stays for Column-level composition and as the
    executable spec the SQL twins mirror."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    # sequence(1, k) descends when k < 1 — short docs must yield [] instead.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
