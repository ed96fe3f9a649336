"""C4/Gopher-style heuristic quality rules — pure column expressions.

Published filters (C4: Raffel et al. 2020 §2.2; Gopher: Rae et al.
2021 App. A) re-expressed as `pyspark.sql.functions` so they fuse into
one WholeStageCodegen project over the scan.  Each rule is exposed
individually (for metrics histograms) plus a fused `passes_quality`.

All SQL-oracle expressible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Symbols counted for the symbol-ratio rule.  JSON structural chars are
# deliberately excluded — payload-bearing web text legitimately contains
# them; this measures boilerplate/garbage noise (Gopher symbol ratio).
SYMBOL_PATTERN = r"[#@~^|<>*%+=\\\\]"
STOPWORD_PATTERN = r"(?i)\b(the|and|of|to|in|der|die|und|le|la|et)\b"

MIN_WORDS = 5
MAX_WORDS = 200_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 14.0
MAX_SYMBOL_RATIO = 0.10
MIN_DISTINCT_RATIO = 0.10


def words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def n_words(text: Column) -> Column:
    return F.size(words(text))


MAX_WORD_LEN_FOR_MEAN = 30


def mean_word_len(text: Column) -> Column:
    """Mean length of *prose-like* words (<=30 chars).

    Embedded payloads (a JSON object is one whitespace-token) would
    otherwise dominate the mean; Gopher's 3-10 band is about prose.
    """
    w = F.filter(words(text), lambda x: F.length(x) <= MAX_WORD_LEN_FOR_MEAN)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(w), F.lit(1))


def symbol_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(SYMBOL_PATTERN)) / F.greatest(F.length(text), F.lit(1))


def has_stopword(text: Column) -> Column:
    return F.regexp_count(text, F.lit(STOPWORD_PATTERN)) > 0


def distinct_word_ratio(text: Column) -> Column:
    w = words(text)
    return F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1))


BULLET_LINE_PATTERN = r"(?m)^[ \t]*[-*•]"
ELLIPSIS_LINE_PATTERN = r"(?m)(\.\.\.|…)[ \t]*$"
MAX_BULLET_LINE_RATIO = 0.90  # Gopher App. A
MAX_ELLIPSIS_LINE_RATIO = 0.30  # Gopher App. A
MIN_ALPHA_WORD_RATIO = 0.80  # Gopher App. A


def n_lines(text: Column) -> Column:
    return F.size(F.split(text, "\n"))


def bullet_line_ratio(text: Column) -> Column:
    """Fraction of lines starting with a bullet (Gopher <= 0.9)."""
    return F.regexp_count(text, F.lit(BULLET_LINE_PATTERN)) / F.greatest(n_lines(text), F.lit(1))


def ellipsis_line_ratio(text: Column) -> Column:
    """Fraction of lines ending in an ellipsis (Gopher <= 0.3)."""
    return F.regexp_count(text, F.lit(ELLIPSIS_LINE_PATTERN)) / F.greatest(n_lines(text), F.lit(1))


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of words containing an alphabetic char (Gopher >= 0.8)."""
    w = words(text)
    alpha = F.filter(w, lambda x: x.rlike("[A-Za-z]"))
    return F.size(alpha) / F.greatest(F.size(w), F.lit(1))


def has_lorem_ipsum(text: Column) -> Column:
    """C4: any document containing the placeholder phrase drops."""
    return F.lower(text).contains("lorem ipsum")


def dup_line_ratio(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line
    (Gopher repetition family: duplicate-line fraction <= 0.3)."""
    lines = F.split(text, "\n")
    return (F.size(lines) - F.size(F.array_distinct(lines))) / F.greatest(
        F.size(lines), F.lit(1)
    )


def quality_columns(text: Column) -> dict[str, Column]:
    return {
        "q_n_words": n_words(text),
        "q_mean_word_len": mean_word_len(text),
        "q_symbol_ratio": symbol_ratio(text),
        "q_has_stopword": has_stopword(text),
        "q_distinct_ratio": distinct_word_ratio(text),
        "q_bullet_ratio": bullet_line_ratio(text),
        "q_ellipsis_ratio": ellipsis_line_ratio(text),
        "q_alpha_ratio": alpha_word_ratio(text),
        "q_lorem_ipsum": has_lorem_ipsum(text),
        "q_dup_line_ratio": dup_line_ratio(text),
    }


def passes_quality(text: Column) -> Column:
    nw = n_words(text)
    mwl = mean_word_len(text)
    return (
        (nw >= MIN_WORDS)
        & (nw <= MAX_WORDS)
        & (mwl >= MIN_MEAN_WORD_LEN)
        & (mwl <= MAX_MEAN_WORD_LEN)
        & (symbol_ratio(text) <= MAX_SYMBOL_RATIO)
        & has_stopword(text)
        & (distinct_word_ratio(text) >= MIN_DISTINCT_RATIO)
    )


def quality_sql(col: str = "text") -> dict[str, str]:
    """DuckDB oracle expressions, numerically identical formulations."""
    nw = f"len(regexp_split_to_array(trim({col}), '\\s+'))"
    wfilt = (
        f"list_filter(regexp_split_to_array(trim({col}), '\\s+'), "
        f"w -> length(w) <= {MAX_WORD_LEN_FOR_MEAN})"
    )
    mwl = (
        f"list_sum(list_transform({wfilt}, w -> length(w))) / "
        f"greatest(len({wfilt}), 1)"
    )
    sym = f"len(regexp_extract_all({col}, '{SYMBOL_PATTERN}')) / greatest(length({col}), 1)"
    stop = f"len(regexp_extract_all({col}, '{STOPWORD_PATTERN}')) > 0"
    dr = (
        f"len(list_distinct(regexp_split_to_array(trim({col}), '\\s+'))) / "
        f"greatest({nw}, 1)"
    )
    nl = f"len(string_split({col}, chr(10)))"
    bullets = (
        f"len(regexp_extract_all({col}, '(?m)^[ \\t]*[-*•]')) / greatest({nl}, 1)"
    )
    ellip = (
        f"len(regexp_extract_all({col}, '(?m)(\\.\\.\\.|…)[ \\t]*$')) / greatest({nl}, 1)"
    )
    alpha_w = (
        f"len(list_filter(regexp_split_to_array(trim({col}), '\\s+'), "
        f"w -> regexp_matches(w, '[A-Za-z]'))) / greatest({nw}, 1)"
    )
    lorem = f"contains(lower({col}), 'lorem ipsum')"
    dup_lines = (
        f"({nl} - len(list_distinct(string_split({col}, chr(10))))) / greatest({nl}, 1)"
    )
    return {
        "q_n_words": nw,
        "q_mean_word_len": mwl,
        "q_symbol_ratio": sym,
        "q_has_stopword": stop,
        "q_distinct_ratio": dr,
        "q_bullet_ratio": bullets,
        "q_ellipsis_ratio": ellip,
        "q_alpha_ratio": alpha_w,
        "q_lorem_ipsum": lorem,
        "q_dup_line_ratio": dup_lines,
        "passes": (
            f"({nw} >= {MIN_WORDS} AND {nw} <= {MAX_WORDS} AND {mwl} >= {MIN_MEAN_WORD_LEN} "
            f"AND {mwl} <= {MAX_MEAN_WORD_LEN} AND {sym} <= {MAX_SYMBOL_RATIO} "
            f"AND {stop} AND {dr} >= {MIN_DISTINCT_RATIO})"
        ),
    }
