"""In-engine BPE tokenizer learning (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of a training-data
pipeline, run where the data is.

Scale shape: the only corpus-sized work is ONE distributed
word-frequency aggregation (map-side partial combine — hot words
contribute ~one row per map partition).  The merge loop then runs
driver-side on the VOCABULARY table (bounded by ``max_vocab_words``;
this is standard practice — HF tokenizers / sentencepiece train from
word counts, never raw text).  Distributed pair counting
(``pair_counts``) and corpus encoding (``bpe_token_counts``) are
vocabulary-bounded / zero-shuffle Arrow passes.

DuckDB-checkable end to end: the learning oracle replays the exported
merge sequence with a RECURSIVE CTE over the word table —
``replace()``'s left-to-right non-overlapping scan over a
space-delimited segmentation string is exactly BPE's greedy
within-word merge — recomputing every intermediate segmentation and
every round's weighted pair counts from raw documents, then
confirming each exported merge was that round's
(count desc, pair asc) argmax.  A wrong merge at ANY round therefore
hash-mismatches.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_remedy_spark.functions.textstats import _WORD_RE

_WORD_CRE = re.compile(_WORD_RE)

# driver-side learning is bounded by the vocabulary, not the corpus;
# the oracle mirrors this cut (same freq-desc/word-asc order)
MAX_VOCAB_WORDS = 1_000_000


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased ``[a-z0-9]+`` runs — the same word
    convention as ``textstats.vocab_stats``."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _merge_once(tokens: tuple, a: str, b: str) -> tuple:
    """Greedy left-to-right non-overlapping merge of (a, b) -> a+b."""
    out, i, n = [], 0, len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return tuple(out)


def learn_bpe_from_freqs(
    word_freq_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The classic BPE loop over an in-memory (word, freq) table.
    Deterministic argmax: highest weighted pair count, ties to the
    lexicographically smallest (a, b).  Stops early when no pair
    remains."""
    seg = {w: tuple(w) for w, _ in word_freq_rows}
    freq = dict(word_freq_rows)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in seg.items():
            f = freq[w]
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        seg = {
            w: _merge_once(t, a, b) if a in t and b in t else t
            for w, t in seg.items()
        }
    return merges


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab_words: int = MAX_VOCAB_WORDS,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus: distributed word
    counting, then the driver-side loop on the (bounded) vocabulary.
    The ``max_vocab_words`` cut is deterministic — top words by
    (freq desc, word asc), planned as TakeOrderedAndProject."""
    wf = word_freqs(docs, text_col)
    rows = (
        wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab_words).collect()
    )
    return learn_bpe_from_freqs([(r["word"], r["freq"]) for r in rows], n_merges)


def apply_merges(word: str, merges: list[tuple[str, str]]) -> tuple:
    """Segment one word under a learned merge table (rank order)."""
    toks = tuple(word)
    for a, b in merges:
        if a in toks and b in toks:
            toks = _merge_once(toks, a, b)
    return toks


def pair_counts(
    word_freq: DataFrame, merges: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Distributed weighted adjacent-pair counts ``(a, b, cnt)`` over
    a (word, freq) table segmented under ``merges`` (round-0 chars
    when empty) — the per-round statistic of BPE training, as a
    vocabulary-bounded Arrow pass + one hash agg."""
    import pandas as pd

    ms = list(merges or [])

    def gen(batches):
        for pdf in batches:
            rows_a, rows_b, rows_f = [], [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                toks = apply_merges(w, ms)
                for i in range(len(toks) - 1):
                    rows_a.append(toks[i])
                    rows_b.append(toks[i + 1])
                    rows_f.append(f)
            yield pd.DataFrame({"a": rows_a, "b": rows_b, "freq": rows_f})

    part = word_freq.mapInPandas(gen, schema="a string, b string, freq long")
    return part.groupBy("a", "b").agg(F.sum("freq").alias("cnt"))


def bpe_vocab(merges: list[tuple[str, str]], alphabet) -> dict[str, int]:
    """Deterministic token-id table for a learned merge set: ids 1..K
    for the sorted base alphabet, then merge products in rank order
    (duplicates keep their first id — two merge paths can produce the
    same string).  Id 0 is reserved for unknown tokens (characters
    outside the training alphabet at encode time)."""
    vocab: dict[str, int] = {}
    for ch in sorted(alphabet):
        vocab.setdefault(ch, len(vocab) + 1)
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab) + 1)
    return vocab


def corpus_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Distinct characters of the word stream — the base-token
    alphabet captured at train time.  Bounded driver collect: the word
    regex class admits at most 36 symbols."""
    rows = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
            ).alias("w")
        )
        .select(F.explode(F.expr("split(w, '')")).alias("c"))
        .where("c != ''")
        .distinct()
        .collect()
    )
    return sorted(r["c"] for r in rows)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer APPLICATION — the loader-facing step that completes
    the learn -> encode -> pack loop: ``(doc_id, pos, token_id)`` with
    ``pos`` the doc-level token index and ids from ``bpe_vocab``
    (unknown base characters map to 0).  Zero-shuffle Arrow kernel
    with the encoder's per-batch word memo; at 100 TB this is the
    map-only pass whose output feeds ``pack_sequences`` on ids."""
    import pandas as pd

    ms = list(merges)
    vb = dict(vocab)
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    id_type = src.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        memo: dict[str, list] = {}

        def ids(w: str) -> list:
            if w not in memo:
                memo[w] = [vb.get(tok, 0) for tok in apply_merges(w, ms)]
            return memo[w]

        for pdf in batches:
            d_out, p_out, t_out = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["t"].fillna("")):
                pos = 0
                for w in _WORD_CRE.findall(t.lower()):
                    for tid in ids(w):
                        d_out.append(did)
                        p_out.append(pos)
                        t_out.append(tid)
                        pos += 1
            yield pd.DataFrame({"doc_id": d_out, "pos": p_out, "token_id": t_out})

    return src.mapInPandas(
        gen, schema=f"doc_id {id_type}, pos long, token_id long"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus encoding statistic: ``(doc_id, n_tokens)`` after the
    learned merges — zero-shuffle Arrow kernel with a per-batch word
    memo (web text repeats words heavily, so each distinct word
    segments once per batch)."""
    import pandas as pd

    ms = list(merges)
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    id_type = src.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        memo: dict[str, int] = {}

        def n_tok(w: str) -> int:
            if w not in memo:
                memo[w] = len(apply_merges(w, ms))
            return memo[w]

        for pdf in batches:
            outs = []
            for t in pdf["t"].fillna(""):
                outs.append(sum(n_tok(w) for w in _WORD_CRE.findall(t.lower())))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_tokens": outs})

    return src.mapInPandas(gen, schema=f"doc_id {id_type}, n_tokens long")
