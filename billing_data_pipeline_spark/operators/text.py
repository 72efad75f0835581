"""[EXT] Text-analysis operators for LLM-data pipelines (SURVEY.md §2.12).

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over a text column — all pure built-in column
expressions (JVM-side, whole-stage codegen; zero Python in the hot path),
so they scale linearly with the scan at 100 TB.

Cross-engine determinism notes (verified against DuckDB):
- regexp_count on simple ASCII classes matches RE2/Java semantics,
- split-to-chars + ascii + fold rolling hash is integer-exact,
- ratios are single IEEE divisions of identical integer operands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9]+"
PUNCT_RE = "[.,!?;:]"

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Alphabetical tie-break on scores.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "and", "is", "of", "to"),
    "es": ("el", "los", "es", "y", "de"),
    "fr": ("le", "les", "est", "et", "une"),
    "zh": ("的", "是", "了", "在", "我"),
}


def token_count(text: Column) -> Column:
    """Whitespace/punctuation-delimited word-ish token count."""
    return F.regexp_count(text, F.lit(WORD_RE))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word pieces of <=4 chars + punctuation
    (a cheap, deterministic stand-in for a real tokenizer's token count)."""
    return F.regexp_count(text, F.lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_RE))


def stopword_count(text: Column, lang: str) -> Column:
    """Occurrences of the language's marker words (word-bounded)."""
    pat = "\\b(" + "|".join(LANG_MARKERS[lang]) + ")\\b"
    return F.regexp_count(text, F.lit(pat))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in sorted(LANG_MARKERS)}


def predicted_lang(text: Column) -> Column:
    """argmax over stopword scores, alphabetical priority on ties."""
    scores = lang_scores(text)
    langs = sorted(scores)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front: lang wins if its score >= max of
    # the languages after it (alphabetical priority).
    for i in range(len(langs) - 2, -1, -1):
        rest = [scores[l2] for l2 in langs[i + 1 :]]
        rest_max = rest[0] if len(rest) == 1 else F.greatest(*rest)
        expr = F.when(scores[langs[i]] >= rest_max, langs[i]).otherwise(expr)
    return expr


def quality_score(text: Column) -> Column:
    """Deterministic [0,1]-ish quality heuristic: word density minus
    punctuation excess (length/punct/token ratios, single IEEE divisions)."""
    n_chars = F.length(text)
    words = token_count(text)
    puncts = punct_count(text)
    word_density = words.cast("double") / n_chars
    punct_ratio = puncts.cast("double") / n_chars
    return word_density - punct_ratio


def rolling_fingerprint(text: Column, modulus: int = 2147483647) -> Column:
    """Polynomial rolling hash over characters (base 31, mod 2^31-1) —
    a deterministic document fingerprint computed with a higher-order fold
    (F.aggregate), no UDF. Guard empty strings upstream (fold needs >=1 char
    to match DuckDB's init-less list_reduce)."""
    chars = F.split(text, "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % modulus
    )


def fingerprint_sql(expr: str, modulus: int = 2147483647) -> str:
    """DuckDB-side rolling fingerprint identical to rolling_fingerprint."""
    return (
        f"list_reduce(list_transform(regexp_split_to_array({expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % {modulus})"
    )
