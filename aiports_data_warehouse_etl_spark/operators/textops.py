"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are native Spark SQL functions (JVM-side,
whole-stage codegen) — no Python UDFs. Every function returns Columns
or a DataFrame transform so Catalyst can prune/push down around them.

Designed for the ``documents`` table (doc_id, text, lang, source,
n_chars) but column-parameterized. The DuckDB oracle twins of these
expressions live in ``queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Small deterministic marker-word sets for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas"],
    "es": ["el", "los", "las", "y", "es", "una", "no"],
}

#: Order matters: deterministic tie-break (first wins on equal score).
LANG_PRIORITY = ["en", "de", "fr", "es"]

STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (regex split, handles runs of spaces)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alphanumeric runs + individual
    punctuation marks, the usual pre-tokenizer regex approximation.
    """
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).cast("long")


def _count_in(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    return _count_in(toks, STOPWORDS) / F.greatest(F.size(toks), F.lit(1))


def unique_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column, n_chars: Column | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: length saturation +
    vocabulary diversity + stopword presence. Rounded to 6 so the
    DuckDB oracle hash-matches bit-for-bit.
    """
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    uniq = F.size(F.array_distinct(toks)) / n
    stop = F.least(
        (_count_in(toks, STOPWORDS) / n) * F.lit(5.0), F.lit(1.0)
    )
    return F.round(
        F.lit(0.5) * len_score + F.lit(0.3) * uniq + F.lit(0.2) * stop, 6
    )


def lang_id(text: Column) -> Column:
    """N-gram/marker-word language heuristic.

    CJK codepoints → 'zh'; otherwise argmax of per-language marker-word
    hit counts with a fixed priority tie-break; no hits at all → 'und'.
    """
    toks = tokens(text)
    scores = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.when(text.rlike("[\\u4e00-\\u9fff]"), F.lit("zh")).when(
        best == 0, F.lit("und")
    )
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Classic key-collision fingerprint: md5 over the sorted distinct
    token set — whitespace/order/duplication insensitive.
    """
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(text)))), " ")
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the text (w-shingling unit for
    minhash / Jaccard). Empty array when the text has < k tokens.
    """
    toks = tokens(text)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(F.when(n >= k, shingled).otherwise(F.array().cast("array<string>")))


def shingle_fingerprint(text: Column, k: int = 3) -> Column:
    """Rolling-hash-style document fingerprint: lexicographic min of the
    md5'd shingle set (a 1-hash minhash).
    """
    return F.array_min(F.transform(word_shingles(text, k), F.md5))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-shingles from an ALREADY-MATERIALIZED token array
    column. Keep the token array a real attribute (withColumn), not an
    inline expression: Catalyst re-evaluates non-attribute subtrees
    inside each lambda element — an inline tokenizer would re-split the
    text once per shingle (measured ~25× slowdown at sf0.1).
    """
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(
        F.when(n >= k, shingled).otherwise(F.array().cast("array<string>"))
    )


def add_shingles(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    out: str = "sh",
) -> DataFrame:
    """Attach a distinct-k-shingle column via a materialized token
    attribute (see shingles_from_tokens for why two steps)."""
    return (
        df.withColumn("__toks", tokens(F.col(text_col)))
        .withColumn(out, shingles_from_tokens(F.col("__toks"), k))
        .drop("__toks")
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection with the full metric suite attached."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "uniq_ratio": F.round(unique_token_ratio(t), 6),
            "stop_ratio": F.round(stopword_ratio(t), 6),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fp": fingerprint(t),
        }
    )


# ---------------------------------------------------------------------------
# Training-data hygiene: PII scrubbing, repetition, decontamination
# ---------------------------------------------------------------------------

#: (pattern, replacement) chain — order matters (emails before bare
#: domains, long digit runs after phones). Patterns restricted to
#: syntax shared by Java regex and RE2 so oracles stay portable.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # card-length digit runs BEFORE phones: the phone pattern has no
    # leading \b ('(' is a non-word char, so a boundary there can never
    # match after a space) and would otherwise eat a card number's tail
    (r"\b\d{13,19}\b", "<CARDNUM>"),
    (r"(\+?1[ .-]?)?(\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Chained regex redaction of common PII shapes (emails, SSNs,
    phone numbers, card-length digit runs). JVM-side regexp_replace —
    at 100 TB this runs inside codegen over the scan, no UDF."""
    out = text
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def repetition_ratio(text: Column, k: int = 3) -> Column:
    """Intra-document repetition: 1 - distinct/total k-shingles (the
    Gopher-style repetitiousness quality signal). 0 = no repetition;
    → 1 for heavily looped text. Docs shorter than k tokens score 0."""
    toks = tokens(text)
    n = F.size(toks) - F.lit(k - 1)
    shingled = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(
        n > 0,
        F.round(1 - F.size(F.array_distinct(shingled)) / n, 6),
    ).otherwise(F.lit(0.0))
