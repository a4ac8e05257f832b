"""Text expression library — pure Column functions, no UDFs.

Absorbs the reference's Python-side string logic as native Spark
expressions (SURVEY.md §2.8): keyword extraction (reference app.py:81-96),
token-set title matching (app_scraper.py:13-39), URL rewriting
(app_scraper.py:86-91) — plus the training-data text-analysis primitives
(language id, quality scoring, token counting, fingerprinting).

Everything stays inside whole-stage codegen: lower/regexp/split/array
functions are JVM expressions, so these run at scan speed with zero
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword list used by keyword extraction and language scoring.
#: Same spirit as the reference's 79-word inline list (app.py:81-90);
#: kept short and embedded verbatim in oracle SQL for parity.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "by", "at", "it", "this", "that", "are", "be",
)

#: English function words for the n-gram/stopword language heuristic.
EN_FUNCTION_WORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for",
)


def normalize(text: Column) -> Column:
    """Lowercase, strip punctuation to spaces, squeeze whitespace, trim —
    the reference's `re.sub(r'[^\\w\\s]','')` + lower (app.py:93-94)."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>, no empties)."""
    return F.filter(
        F.split(normalize(text), " "), lambda t: F.length(t) > 0
    )


def keywords(text: Column, min_len: int = 3) -> Column:
    """Reference `extract_keywords` (app.py:93-96): normalized tokens with
    stopwords and short tokens dropped. Returns array<string>."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        tokens(text),
        lambda t: (F.length(t) >= min_len) & ~F.array_contains(stop, t),
    )


def token_overlap_count(a: Column, b: Column) -> Column:
    """|distinct(a) ∩ distinct(b)| — the core of the reference's fuzzy
    title matcher `compare_titles` (app_scraper.py:13-39, which requires
    >= 3 common tokens)."""
    return F.size(F.array_intersect(F.array_distinct(a), F.array_distinct(b)))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are English function words — the language-id
    heuristic's core signal. Exact rational arithmetic (int/int)."""
    toks = tokens(text)
    en = F.array(*[F.lit(w) for w in EN_FUNCTION_WORDS])
    n_en = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    return n_en / F.greatest(F.size(toks), F.lit(1))


def lang_guess(text: Column, threshold: float = 0.12) -> Column:
    """Heuristic language id: 'en' if the function-word ratio clears the
    threshold, else 'other'. A real deployment swaps in per-language
    function-word tables; the operator shape (pure expression, no UDF)
    is the point."""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column) -> Column:
    """Document quality in [0,1]: length saturation + alpha purity +
    stopword presence, equally weighted. All rational arithmetic so any
    engine reproduces it bit-for-bit."""
    toks = tokens(text)
    n = F.size(toks)
    len_component = F.least(n / F.lit(50.0), F.lit(1.0))
    alpha_chars = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
    total_chars = F.greatest(F.length(text), F.lit(1))
    alpha_component = alpha_chars / total_chars
    stop_component = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return (
        len_component / 3 + alpha_component / 3 + stop_component / 3
    )


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, or single
    other non-space chars — a cheap proxy for subword tokenizer load."""
    return F.regexp_count(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Collision-safe enough for exact-dedup keys at 100 TB (128-bit)."""
    return F.md5(normalize(text))


def rewrite_icon_url(url: Column, size: int = 512) -> Column:
    """Reference icon URL rewrite `url.split('=s')[0] + '=s512'`
    (app_scraper.py:86-91) as a native expression."""
    return F.concat(F.substring_index(url, "=s", 1), F.lit(f"=s{size}"))


def sql_quoted_list(words: tuple[str, ...]) -> str:
    """Render a word tuple as a SQL IN-list / array literal body, so oracle
    SQL embeds exactly the same vocabulary as the Column functions."""
    return ", ".join(f"'{w}'" for w in words)
