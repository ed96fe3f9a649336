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


# --------------------------------------------------------------------------
# Gopher n-gram repetition signals (Rae et al. 2021, Table A1)
# --------------------------------------------------------------------------
#
# The remaining published repetition family beyond dup_line_ratio:
#   * top-n-gram fraction  — chars covered by the single most frequent
#     word n-gram / total chars (Gopher drops at >0.20 for n=2);
#   * duplicated-n-gram fraction — chars covered by word n-grams that
#     occur more than once (Gopher drops at >0.15 for n=5).
# Per-document statistics — computed in ONE zero-shuffle Arrow kernel
# (see ngram_repetition docstring); no gram table ever shuffles.

def ngram_repetition(
    docs, top_n: int = 2, dup_n: int = 5, id_col: str = "doc_id", text_col: str = "text"
):
    """(doc_id, top{top_n}_frac, dup{dup_n}_frac) over lowercased
    whitespace-normalized text.  Fractions are (occurrences x gram
    chars) / total chars — integer arithmetic plus ONE IEEE division,
    bit-identical in the DuckDB oracle.  Ties for the top gram break
    on the lexicographically smallest gram (min of (-count, gram)).

    Per-document statistics need NO cross-document aggregation, so the
    whole computation is one zero-shuffle mapInPandas kernel over the
    JVM-normalized text (the previous explode + double-groupBy
    formulation shuffled two full gram tables — 4 exchanges, 21 s at
    sf0.1 vs ~1 s for this kernel; the oracle pins both identical).
    Normalization stays a JVM expression so the regex semantics match
    the SQL oracle exactly."""
    import pandas as pd
    from pyspark.sql import functions as F

    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    base = docs.select(F.col(id_col).alias("doc_id"), norm.alias("t"))
    top_name, dup_name = f"top{top_n}_frac", f"dup{dup_n}_frac"

    def gen(batches):
        for pdf in batches:
            tops, dups = [], []
            for t in pdf["t"]:
                if t is None:
                    # NULL text -> 0.0 fractions, matching the pre-
                    # rewrite DataFrame semantics (review r3: the
                    # kernel must not crash the stage on one NULL row)
                    tops.append(0.0)
                    dups.append(0.0)
                    continue
                total = max(len(t), 1)
                ws = t.split(" ")
                top_chars = 0
                if len(ws) >= top_n:
                    counts: dict = {}
                    for i in range(len(ws) - top_n + 1):
                        g = " ".join(ws[i : i + top_n])
                        counts[g] = counts.get(g, 0) + 1
                    nc, g = min((-c, g) for g, c in counts.items())
                    top_chars = (-nc) * len(g)
                dup_chars = 0
                if len(ws) >= dup_n:
                    counts = {}
                    for i in range(len(ws) - dup_n + 1):
                        g = " ".join(ws[i : i + dup_n])
                        counts[g] = counts.get(g, 0) + 1
                    dup_chars = sum(c * len(g) for g, c in counts.items() if c >= 2)
                tops.append(top_chars / total)
                dups.append(dup_chars / total)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], top_name: tops, dup_name: dups}
            )

    return base.mapInPandas(
        gen, schema=f"doc_id long, {top_name} double, {dup_name} double"
    )


def ngram_repetition_sql(
    top_n: int = 2, dup_n: int = 5, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB oracle for ``ngram_repetition`` (window rank for the top
    gram — ORDER BY cnt DESC, gram == Spark's min((-count, gram)))."""

    def grams(n: int) -> str:
        return (
            f"SELECT doc_id, unnest(CASE WHEN len(ws) >= {n} THEN "
            f"list_transform(range(1, len(ws) - {n} + 2), "
            f"i -> array_to_string(ws[i : i + {n} - 1], ' ')) "
            f"ELSE [] END) AS gram FROM b"
        )

    return f"""
      WITH base AS (
        SELECT doc_id,
               lower(regexp_replace(trim({text_col}), '\\s+', ' ', 'g')) AS t
        FROM {table}
      ),
      b AS (SELECT doc_id, t, length(t) AS total,
                   regexp_split_to_array(t, ' ') AS ws FROM base),
      gt AS ({grams(top_n)}),
      gd AS ({grams(dup_n)}),
      topc AS (
        SELECT doc_id, cnt * length(gram) AS top_chars
        FROM (SELECT doc_id, gram, count(*) AS cnt,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY count(*) DESC, gram) AS rn
              FROM gt GROUP BY doc_id, gram)
        WHERE rn = 1
      ),
      dupc AS (
        SELECT doc_id, sum(cnt * length(gram)) AS dup_chars
        FROM (SELECT doc_id, gram, count(*) AS cnt FROM gd GROUP BY doc_id, gram)
        WHERE cnt >= 2 GROUP BY doc_id
      )
      SELECT b.doc_id::BIGINT AS doc_id,
             (coalesce(top_chars, 0) / greatest(total, 1))::DOUBLE AS top{top_n}_frac,
             (coalesce(dup_chars, 0) / greatest(total, 1))::DOUBLE AS dup{dup_n}_frac
      FROM b LEFT JOIN topc ON topc.doc_id = b.doc_id
             LEFT JOIN dupc ON dupc.doc_id = b.doc_id
    """
