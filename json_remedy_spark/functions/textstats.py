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


_WORD_RE = "[a-z0-9]+"


def vocab_stats(docs, top_k: int | None = None, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus vocabulary table: (word, n_docs, n_occurrences) over
    lowercased alphanumeric word runs — the tokenizer-training /
    corpus-inspection staple.

    Scale shape: the exploded word stream hash-aggregates with
    MAP-SIDE partial combine, so hot words ("the" in 10^12 docs)
    contribute ~one row per map partition to the shuffle — hot-key
    safe by construction.  ``n_docs`` dedups (word, doc_id) first
    (Spark plans the distinct as its own partial-combined aggregate).
    With ``top_k``, the global cut is orderBy+limit, which Spark
    executes as TakeOrderedAndProject — per-partition top-K then a
    K-row merge, NOT a full sort; ties break on the word so the cut
    is deterministic cross-engine."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")).alias("word"),
    )
    occ = words.groupBy("word").agg(F.count("*").alias("n_occ"))
    per_doc = words.distinct().groupBy("word").agg(F.count("*").alias("n_docs"))
    out = occ.join(per_doc, "word").select("word", "n_docs", "n_occ")
    if top_k is not None:
        out = out.orderBy(F.desc("n_occ"), F.asc("word")).limit(top_k)
    return out


def vocab_stats_sql(top_k: int | None = None, table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle for ``vocab_stats``."""
    q = f"""
      WITH words AS (
        SELECT doc_id, unnest(regexp_extract_all(lower({text_col}), '{_WORD_RE}')) AS word
        FROM {table}
      )
      SELECT word, count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS n_occ
      FROM words GROUP BY word
    """
    if top_k is not None:
        q += f" ORDER BY n_occ DESC, word LIMIT {top_k}"
    return q
