"""Text analysis: token counting, document fingerprinting — columns.

* ``token_count``  — whitespace words plus a BPE-ish regex count
  (``\\w+`` runs and single non-space punctuation both count).
* ``fingerprint``  — md5 of whitespace-normalized lowercased text
  (deterministic, portable: identical string in Spark and DuckDB).

All SQL-oracle expressible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def line_count(text: Column) -> Column:
    return F.size(F.split(text, "\n"))


def normalized(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    return F.md5(normalized(text))


def stats_sql(col: str = "text") -> dict[str, str]:
    norm = f"lower(regexp_replace(trim({col}), '\\s+', ' ', 'g'))"
    return {
        "token_count": f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))",
        "word_count": f"len(regexp_split_to_array(trim({col}), '\\s+'))",
        "line_count": f"len(string_split({col}, chr(10)))",
        "fingerprint": f"md5({norm})",
    }
