"""Deterministic stopword-profile language ID — pure column expressions.

Stands in for fastText langid (north_rule): same API shape (text ->
(lang, confidence)), deterministic, JVM-side so it codegens into the
scan stage.  A fastText model would slot in as a pandas UDF behind the
same column name; the sandbox has no model file, and the heuristic is
exact on the synthetic corpus.

SQL-oracle expressible: regexp counts over the same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Distinctive high-frequency function words per language.  Word-boundary
# regexes; (?i) for case folding.  Kept RE2/Java-regex compatible so the
# DuckDB oracle runs the identical pattern.
LANG_PATTERNS = {
    "en": r"(?i)\b(the|and|is|that|this|with|for|what|when|over|because)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|den|dem|durch|unter|einem)\b",
    "fr": r"(?i)\b(le|la|les|et|est|dans|que|pour|par|sous|pendant)\b",
}
MIN_HITS = 1  # below this the doc is 'xx' (unknown)


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: F.regexp_count(text, F.lit(pat)) for lang, pat in LANG_PATTERNS.items()}


def detect_language(text: Column) -> Column:
    """argmax over stopword-hit counts; 'xx' when no language clears
    MIN_HITS."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    expr = F.lit("xx")
    # reverse order so earlier langs win ties via the outermost when()
    for lang in reversed(list(LANG_PATTERNS)):
        expr = F.when((s[lang] == best) & (best >= MIN_HITS), F.lit(lang)).otherwise(expr)
    return expr


def detect_language_sql(col: str = "text") -> str:
    """The equivalent ANSI SQL (DuckDB) expression for the oracle."""
    scores = {
        lang: f"len(regexp_extract_all({col}, '{pat}'))"
        for lang, pat in LANG_PATTERNS.items()
    }
    best = "greatest({})".format(", ".join(scores.values()))
    expr = "'xx'"
    for lang in reversed(list(LANG_PATTERNS)):
        expr = (
            f"CASE WHEN {scores[lang]} = {best} AND {best} >= {MIN_HITS} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr
