"""Text analysis operators for document pipelines.

All pure Column expressions — whole-stage codegen, zero Python in the
hot path, linear scans with no shuffle. Each op is designed to be
bit-reproducible in ANSI SQL (DuckDB oracle parity): tokenization is
regex whitespace split, hashes are md5.
"""

from __future__ import annotations

import functools
from weakref import WeakKeyDictionary

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Column-builder memoization.
#
# Building these expression trees is py4j-chatty — quality_score() alone
# issues ~1000 JVM calls (~0.8 s measured), and the corpus query rows use
# the same trees over and over. A Column built from an UNRESOLVED name
# (F.col("text")) is an immutable tree that re-binds per consuming
# DataFrame, so one instance can serve every plan in the session.
#
# The cache therefore only engages when the caller passes the column BY
# NAME (a str): a Column-typed argument may already be resolved against
# one specific frame (df["text"]) and must never be shared across frames
# (its string form is indistinguishable from the unresolved one — see
# tests/test_llm.py::test_text_builder_memo). Keyed per live
# SparkContext via weakref so a stopped session cannot leak stale JVM
# handles into the next one.
# ---------------------------------------------------------------------------
_MEMO: "WeakKeyDictionary" = WeakKeyDictionary()


def _memo_builder(fn):
    @functools.wraps(fn)
    def wrap(col, *args, **kwargs):
        if not isinstance(col, str):
            return fn(col, *args, **kwargs)
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is None or kwargs:
            return fn(F.col(col), *args, **kwargs)
        try:
            cache = _MEMO.setdefault(sc, {})
        except TypeError:  # SparkContext not weakref-able on this build
            return fn(F.col(col), *args, **kwargs)
        key = (fn.__name__, col, args)
        if key not in cache:
            cache[key] = fn(F.col(col), *args)
        return cache[key]

    return wrap

# language-marker stopwords for the n-gram language-ID heuristic.
# Counting is done with a length-difference trick (portable SQL, no
# regexp_count): occurrences(t, w) = (len(t) - len(replace(t, w))) / len(w)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " et ", " les ", " des ", " est "],
    "es": [" el ", " y ", " los ", " que ", " es "],
}

STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


@_memo_builder
def normalize(col: Column | str) -> Column:
    """lower + collapse whitespace — the canonical form every other
    text op keys on."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


@_memo_builder
def tokens(col: Column | str) -> Column:
    return F.split(normalize(col), " ")


@_memo_builder
def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap path; BPE-ish estimate below)."""
    return F.size(tokens(col))


@_memo_builder
def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate without a vocab: splits on
    word/number/punctuation boundaries the way byte-level BPE tends
    to, ~chars/4 floor for CJK-free text."""
    pieces = F.split(
        F.lower(col), r"(?<=[a-z0-9])(?=[^a-z0-9\s])|(?<=[^a-z0-9\s])(?=[a-z0-9])|\s+"
    )
    return F.size(F.filter(pieces, lambda p: p != F.lit("")))


def occurrences(col: Column, word: str) -> Column:
    """Substring occurrence count via length difference — portable to
    any SQL engine (no regexp_count dependency)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(word), F.lit(""))))
        / len(word)
    ).cast("int")


@_memo_builder
def lang_score(col: Column | str, lang: str) -> Column:
    """Marker-word hit count for one language over padded text."""
    padded = F.concat(F.lit(" "), normalize(col), F.lit(" "))
    score = F.lit(0)
    for w in LANG_MARKERS[lang]:
        score = score + occurrences(padded, w)
    return score


@_memo_builder
def language_id(col: Column | str) -> Column:
    """Heuristic language ID over the marker-word profile; returns the
    argmax language or 'und' when nothing matches (CJK etc. — a real
    pipeline plugs fasttext via mapInPandas; this is the JVM-side
    fallback that needs no model artifact)."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    # deterministic tie-break: first lang in sorted order wins (CASE
    # evaluates top-down)
    expr = None
    for lang in sorted(LANG_MARKERS):
        cond = (scores[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


@_memo_builder
def alpha_ratio(col: Column | str) -> Column:
    no_alpha = F.regexp_replace(col, r"[A-Za-z]", "")
    return F.length(col).cast("double") - F.length(no_alpha)


@_memo_builder
def quality_score(col: Column | str) -> Column:
    """Document quality heuristic in [0,1]: combines length band,
    alphabetic ratio, mean word length sanity, and stopword presence.
    Deterministic closed form — reproducible in the SQL oracle."""
    n = F.length(col).cast("double")
    norm = normalize(col)
    toks = F.split(norm, " ")
    n_tok = F.size(toks).cast("double")
    alpha = alpha_ratio(col) / F.greatest(n, F.lit(1.0))
    mean_word = n / F.greatest(n_tok, F.lit(1.0))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    stop_hits = F.lit(0)
    for w in STOPWORDS_EN[:5]:
        stop_hits = stop_hits + occurrences(padded, f" {w} ")
    stop_ratio = stop_hits.cast("double") / F.greatest(n_tok, F.lit(1.0))
    len_score = F.when(n < 20, n / 20.0).when(n > 5000, F.lit(0.5)).otherwise(F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    return F.round(
        0.3 * len_score + 0.3 * F.least(alpha * 1.5, F.lit(1.0))
        + 0.2 * word_score + 0.2 * stop_score,
        4,
    )


@_memo_builder
def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text. The exact-dedup
    key — portable, stable across engines."""
    return F.md5(normalize(col))


@_memo_builder
def _gram_extract(col: Column | str, k: int) -> Column:
    """ALL word k-grams of the normalized text, in order, via ONE
    native regex pass: the pattern captures the k-word window in a
    lookahead (so matches overlap), then consumes one token to
    advance. regexp_extract_all is a codegen'd JVM expression — the
    earlier ``transform`` + k×``try_element_at`` form was interpreted
    per element and measured ~10-30× slower on the corpus (Catalyst
    never compiles lambda HOFs). Docs shorter than k tokens yield
    their single partial gram (the whole normalized doc), matching
    the list-slice truncation the SQL oracle uses."""
    s = normalize(col)
    # possessive quantifiers: token boundaries are deterministic, so
    # backtracking is waste — measured up to 2× faster (Java-regex-
    # only syntax; the SQL oracle replays grams via list slices)
    pat = rf"(?=([^ ]++(?: [^ ]++){{{k - 1}}}+))[^ ]++"
    return F.when(
        F.size(F.split(s, " ")) < k, F.array(s)
    ).otherwise(F.regexp_extract_all(s, F.lit(pat), 1))


@_memo_builder
def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles — input to minhash/jaccard dedup.
    One narrow regex scan per row (see _gram_extract), no shuffle."""
    return F.array_distinct(_gram_extract(col, k))


@_memo_builder
def word_ngrams(col: Column | str, k: int = 2) -> Column:
    """ALL word k-grams in order (duplicates kept — the repetition
    metrics below need multiplicity; ``word_shingles`` is the distinct
    variant)."""
    return _gram_extract(col, k)


@_memo_builder
def dup_ngram_fraction(col: Column | str, k: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of word k-grams that
    are repeats of an earlier occurrence — ``(n - n_distinct) / n``.
    0 for repetition-free text, → 1 for a looping generator. Stays
    entirely inside codegen (size/array_distinct on the gram array)."""
    g = word_ngrams(col, k)
    n = F.size(g).cast("double")
    return F.round((n - F.size(F.array_distinct(g))) / F.greatest(n, F.lit(1.0)), 4)


@_memo_builder
def top_word_fraction(col: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent word (the
    C4/Gopher "most common word covers too much of the doc" filter).

    Computed as the longest equal-run of the SORTED token array via one
    ``aggregate`` fold with a (prev, run, best) struct accumulator —
    O(n log n) per row inside codegen, no shuffle, no UDF. The SQL
    oracle states the same quantity relationally (unnest → group by
    word → max(count)/count), demonstrating the two formulations agree.
    """
    t = F.array_sort(tokens(col))
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best"))

    def step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"))

    best = F.aggregate(t, zero, step, lambda a: a["best"]).cast("double")
    return F.round(best / F.greatest(F.size(t).cast("double"), F.lit(1.0)), 4)


@_memo_builder
def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text."""
    s = normalize(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - n + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.substring(s, i, n))
    return F.array_distinct(grams)
