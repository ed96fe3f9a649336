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


WINNOW_K = 5  # k-gram length (words)
WINNOW_W = 4  # winnowing window


def rolling_fingerprints(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    word k-gram Rabin-style hashes, min-sampled per window — the
    standard near-dup/plagiarism sketch.  mapInPandas kernel; output
    one row per selected fingerprint."""
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def fingerprints(text: str) -> list:
        ws = (text or "").lower().split()
        if len(ws) < WINNOW_K:
            grams = [" ".join(ws)] if ws else []
        else:
            grams = [" ".join(ws[i : i + WINNOW_K]) for i in range(len(ws) - WINNOW_K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
        picked = set()
        for i in range(max(len(hs) - WINNOW_W + 1, 1)):
            win = hs[i : i + WINNOW_W]
            if win:
                picked.add(min(win))
        return sorted(picked)

    def gen(batches):
        for pdf in batches:
            ids, fps = [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                for fp in fingerprints(txt):
                    ids.append(did)
                    fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fingerprint": fps})

    return src.mapInPandas(gen, schema="doc_id long, fingerprint long")


def stats_sql(col: str = "text") -> dict[str, str]:
    norm = f"lower(regexp_replace(trim({col}), '\\s+', ' ', 'g'))"
    return {
        "token_count": f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))",
        "word_count": f"len(regexp_split_to_array(trim({col}), '\\s+'))",
        "line_count": f"len(string_split({col}, chr(10)))",
        "fingerprint": f"md5({norm})",
    }
