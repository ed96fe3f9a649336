"""Deterministic synthetic embedding corpus for ANN scale rehearsals.

Same scale design as ``sources/webpages.py``: every value is a pure
function of ``(seed, vec_id)``, so generation distributes via
``spark.range(n).mapInPandas`` with no driver loop and no
cross-partition state — the same vec_id yields the same vector at any
parallelism, which is what lets the 200k and 2M rehearsal corpora
share structure.

Distribution: a mixture of ``n_labels`` unit-norm Gaussian clusters
(the shape of the driver-generated ``embeddings.parquet`` testdata:
vec_id long, embedding array<float>, label int).  All randomness is
splitmix64 over the (seed, vec_id, dim) counter — no RNG objects, one
vectorized numpy pass per Arrow batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 counter array."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
    return x ^ (x >> np.uint64(31))


def _uniform(counter: np.ndarray) -> np.ndarray:
    """Counter -> open-interval (0,1) doubles."""
    return (_splitmix64(counter).astype(np.float64) + 0.5) / 2.0**64


def _normals(base: np.ndarray, n_cols: int) -> np.ndarray:
    """(len(base), n_cols) standard normals via Box-Muller on counter
    pairs; ``n_cols`` must be even (embedding dims are)."""
    half = n_cols // 2
    ctr = base[:, None] * np.uint64(n_cols) + np.arange(n_cols, dtype=np.uint64)[None, :]
    u = _uniform(ctr & _M)
    u1, u2 = u[:, :half], u[:, half:]
    r = np.sqrt(-2.0 * np.log(u1))
    return np.concatenate(
        [r * np.cos(2 * np.pi * u2), r * np.sin(2 * np.pi * u2)], axis=1
    )


def _centers(n_labels: int, dims: int, seed: int) -> np.ndarray:
    """Unit-norm cluster centers, deterministic in (seed, label)."""
    base = (np.arange(n_labels, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E37)) | np.uint64(1 << 40)
    c = _normals(base, dims)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def synthesize_vectors(
    spark,
    n: int,
    dims: int = 64,
    n_labels: int = 10,
    noise: float = 0.6,
    seed: int = 42,
    partitions: int | None = None,
):
    """(vec_id, embedding array<float>, label) — ``n`` clustered unit
    vectors.  ``noise`` is the EXPECTED NORM of the perturbation
    relative to the unit-norm center (per-dim sd is noise/sqrt(dims)),
    so the mean intra-cluster cosine is ~1/sqrt(1+noise^2) regardless
    of dims — 0.6 gives ~0.86, clearly separable but not trivial for
    IVF probing."""
    if dims % 2:
        raise ValueError("dims must be even (Box-Muller pairs)")
    centers = _centers(n_labels, dims, seed)
    sd = noise / float(np.sqrt(dims))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            mixed = _splitmix64(ids ^ (np.uint64(seed) << np.uint64(32)))
            labels = (mixed % np.uint64(n_labels)).astype(np.int32)
            eps = _normals(mixed, dims) * sd
            emb = centers[labels] + eps
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids.astype(np.int64),
                    "embedding": [r.astype(np.float32) for r in emb],
                    "label": labels,
                }
            )

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema="vec_id long, embedding array<float>, label int")
