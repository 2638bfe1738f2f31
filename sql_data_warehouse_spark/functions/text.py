"""Text-analysis column helpers for large-scale corpus processing.

All helpers are pure Column expressions over pyspark.sql built-ins —
JVM-evaluated, whole-stage-codegen friendly, no Python UDFs — so they
run at full scan speed over 100 TB of documents. Each has a DuckDB
SQL twin used by the oracle gate (see ``operators/`` call sites).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Cheap language-ID marker sets (deterministic heuristic; NOT a real
# language detector — the operator contract is "stable lang guess per
# document", which is what a pipeline filters on).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip everything
    but [a-z0-9 ], collapse whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


NORMALIZE_SQL = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


def tokens(col: Column) -> Column:
    """Whitespace tokenization of the normalized text → array<string>."""
    return F.split(normalize_text(col), " ")


TOKENS_SQL = f"string_split({NORMALIZE_SQL}, ' ')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


TOKEN_COUNT_SQL = f"CAST(len({TOKENS_SQL}) AS BIGINT)"


def char_shingles(col: Column, k: int = 8) -> Column:
    """Character k-gram shingle array of the normalized text (the
    MinHash/Jaccard unit). Sliding window via sequence+transform —
    stays JVM-side."""
    norm = normalize_text(col)
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.transform(idx, lambda i: norm.substr(i, F.lit(k)))


# GPT-2-style pre-tokenizer pattern (simplified, RE2/Java compatible):
# contraction suffixes, letter runs, digit runs, punctuation runs —
# the shape BPE vocabularies segment on.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization → array<string> (JVM regex, no UDF).
    Counting these approximates LLM token counts far better than
    whitespace splitting (punctuation and digit runs count)."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0)


BPE_TOKENS_SQL = (
    "regexp_extract_all({col}, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+|"
    " ?[^A-Za-z0-9\\s'']+')"
)


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 is available and identical in Spark and DuckDB)."""
    return F.md5(normalize_text(col))


FINGERPRINT_SQL = f"md5({NORMALIZE_SQL})"


def alpha_ratio(col: Column) -> Column:
    """Share of alphabetic characters — a quality signal."""
    total = F.length(col)
    alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / total.cast("double")
    )


ALPHA_RATIO_SQL = (
    "CASE WHEN length({col}) = 0 THEN 0.0 ELSE "
    "CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    " / CAST(length({col}) AS DOUBLE) END"
)


def lang_guess(col: Column) -> Column:
    """N-gram/stopword-marker language heuristic: count marker-word
    hits per language over the token set; highest count wins
    (deterministic tie-break by language code), 'und' (undetermined)
    when nothing matches."""
    toks = tokens(col)
    counts = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    # Deterministic argmax: iterate langs sorted, keep strictly-greater.
    best_lang = F.lit("und")
    best_n = F.lit(0)
    for lang in sorted(counts):
        is_better = counts[lang] > best_n
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_n = F.when(is_better, counts[lang]).otherwise(best_n)
    return best_lang


def lang_guess_sql(col: str) -> str:
    """DuckDB twin of :func:`lang_guess` (distinct marker hits via
    list_intersect over the token list)."""
    toks = TOKENS_SQL.format(col=col)
    parts_n = {
        lang: f"len(list_intersect({toks}, {_sql_list(markers)}))"
        for lang, markers in LANG_MARKERS.items()
    }
    best_lang, best_n = "'und'", "0"
    for lang in sorted(parts_n):
        n = parts_n[lang]
        best_lang = f"CASE WHEN {n} > {best_n} THEN '{lang}' ELSE {best_lang} END"
        best_n = f"CASE WHEN {n} > {best_n} THEN {n} ELSE {best_n} END"
    return best_lang


def _sql_list(items: list[str]) -> str:
    inner = ", ".join(f"'{i}'" for i in items)
    return f"[{inner}]"
