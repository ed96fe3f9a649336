"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169, NeurIPS).

Select raw web documents whose hashed-ngram feature distribution looks
like a small target corpus (Wikipedia/books in the paper): fit
bag-of-hashed-bigram unigram models ``p`` (target) and ``q`` (raw)
over ``B`` hash buckets, weight each raw document by

    log w(x) = sum_i [ log p(b_i) - log q(b_i) ]

over its bigram occurrences, then resample without replacement via
Gumbel top-k (key = w/T + Gumbel noise; top-n keys ~ sampling
proportional to exp(w/T) without replacement).  This is the standard
importance-resampling data-selection move for pretraining corpora and
composes with the quality/langid gates in ``operators/pipeline``.

Spark-first shape (10^12-doc honest):

- bucket histograms: zero-shuffle ``mapInPandas`` partials (<= B rows
  per Arrow batch) + one groupBy over <= B keys — the shuffle is
  O(partitions x B), never O(corpus).
- the log-ratio table (B float64s) is built driver-side from the two
  tiny histograms and closure-captured into the scoring kernel — the
  SAME ``score_hashed_bigrams`` kernel as the langid and classifier
  heads (one vectorized Arrow hop, no join, no per-row Python).
- selection: deterministic Gumbel keys from portable md5 noise and
  ``orderBy(key).limit(n)`` — Spark plans TakeOrderedAndProject
  (per-partition top-n + driver merge), no global sort.

DuckDB-checkable end to end: histogram counts are integers, both
engines derive the same smoothed log-ratio via libm doubles, and the
driver queries round to 4 decimals (the perplexity-oracle precedent
for float aggregates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from json_remedy_spark.functions.langid import (
    FT_BUCKETS,
    _ft_bucket,
    score_hashed_bigrams,
)

DSIR_K = 0.5  # add-k smoothing for both unigram bucket models


def _batch_bucket_counts(texts: list[str], n_buckets: int) -> np.ndarray:
    """Occurrence histogram over md5 buckets of char bigrams for one
    Arrow batch — the counting twin of ``score_hashed_bigrams`` (same
    utf-32 decode, same per-DISTINCT-bigram md5)."""
    code_arrays = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts]
    bigram_codes = [
        a[:-1].astype(np.int64) * 0x200000 + a[1:] if len(a) >= 2
        else np.empty(0, dtype=np.int64)
        for a in code_arrays
    ]
    counts = np.zeros(n_buckets, dtype=np.int64)
    if not bigram_codes or not any(len(c) for c in bigram_codes):
        return counts
    uniq, occ = np.unique(np.concatenate(bigram_codes), return_counts=True)
    for code, n in zip(uniq, occ):
        c0, c1 = divmod(int(code), 0x200000)
        counts[_ft_bucket(chr(c0) + chr(c1))] += int(n)
    return counts


def bigram_bucket_counts(
    docs: DataFrame, text_col: str = "text", n_buckets: int = FT_BUCKETS
) -> DataFrame:
    """Corpus-level ``(bucket, cnt)`` histogram of hashed char bigrams
    of ``lower(text)``.  Each task emits <= ``n_buckets`` partial rows;
    the groupBy aggregates <= ``n_buckets`` keys."""
    src = docs.select(F.lower(F.col(text_col)).alias("t"))

    def gen(batches):
        for pdf in batches:
            counts = _batch_bucket_counts(pdf["t"].fillna("").tolist(), n_buckets)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {"bucket": nz.astype(np.int64), "cnt": counts[nz]}
            )

    part = src.mapInPandas(gen, schema="bucket long, cnt long")
    return part.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def dsir_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = FT_BUCKETS,
    k: float = DSIR_K,
) -> np.ndarray:
    """Dense float64 ``log p(b) - log q(b)`` vector from the two
    histograms (driver-side: each input is <= ``n_buckets`` rows).
    Add-k smoothing keeps unseen buckets finite in both models."""

    def dense(df: DataFrame) -> np.ndarray:
        v = np.zeros(n_buckets, dtype=np.float64)
        for r in df.collect():
            v[r["bucket"]] = r["cnt"]
        return v

    # the two histogram jobs are independent — submit both so the
    # second's tasks back-fill the first's tail (guide §2.6); the
    # collected vectors are unchanged
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fp, fq = ex.submit(dense, target_counts), ex.submit(dense, raw_counts)
        p, q = fp.result(), fq.result()
    lp = np.log(p + k) - np.log(p.sum() + k * n_buckets)
    lq = np.log(q + k) - np.log(q.sum() + k * n_buckets)
    return lp - lq


def save_log_ratio(log_ratio: np.ndarray, path: str) -> None:
    """Persist a fitted log-ratio vector as (bucket, log_ratio)
    parquet — the at-rest form: fit once on samples, reuse across
    crawl dumps (the IVF-index / signature-table pattern)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    lr = np.asarray(log_ratio, dtype=np.float64)
    pq.write_table(
        pa.table({"bucket": np.arange(len(lr), dtype=np.int64), "log_ratio": lr}),
        path,
    )


def load_log_ratio(path: str, n_buckets: int = FT_BUCKETS) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(path).to_pydict()
    lr = np.zeros(n_buckets, dtype=np.float64)
    lr[np.asarray(t["bucket"], dtype=np.int64)] = t["log_ratio"]
    return lr


def dsir_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = FT_BUCKETS,
    k: float = DSIR_K,
    log_ratio: np.ndarray | None = None,
    extra_cols: tuple = (),
    raw_histogram_pct: int | None = None,
) -> DataFrame:
    """Per-doc DSIR importance log-weight:
    ``(doc_id, *extra_cols, weight)``.

    Pass either ``target`` (the histograms + log-ratio are computed
    here: two tiny aggregate jobs, then one scoring pass) or a
    precomputed ``log_ratio`` vector (the at-rest form — a production
    run fits the ratio once on samples and reuses it across dumps).
    ``raw_histogram_pct`` fits the raw-side model q on a deterministic
    md5 id-sample instead of the full corpus — at 10^12 docs the
    histogram needs ~10^6 docs to converge, so an extra full pass
    just to count bigrams is waste; the scoring pass still covers
    every doc.  The id keeps its input type; ``extra_cols`` ride
    through the Arrow hop so a pipeline can gate on the weight
    without a join-back."""
    if log_ratio is None:
        if target is None:
            raise ValueError("dsir_weights needs target or log_ratio")
        raw_for_hist = raw
        if raw_histogram_pct is not None:
            from json_remedy_spark.functions.corpus import hash_mod_bucket

            raw_for_hist = raw.where(
                hash_mod_bucket(F.col(id_col)) < raw_histogram_pct
            )
        log_ratio = dsir_log_ratio(
            bigram_bucket_counts(target, text_col, n_buckets),
            bigram_bucket_counts(raw_for_hist, text_col, n_buckets),
            n_buckets,
            k,
        )
    dense = np.asarray(log_ratio, dtype=np.float64).reshape(-1, 1)
    extras = list(extra_cols)
    src = raw.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("t"), *extras
    )
    id_type = src.schema["doc_id"].dataType.simpleString()
    extra_fields = "".join(
        f", {c} {src.schema[c].dataType.simpleString()}" for c in extras
    )

    def gen(batches):
        for pdf in batches:
            scores = score_hashed_bigrams(pdf["t"].fillna("").tolist(), dense)
            out = {"doc_id": pdf["doc_id"]}
            for c in extras:
                out[c] = pdf[c]
            out["weight"] = scores[:, 0]
            yield pd.DataFrame(out)

    return src.mapInPandas(
        gen, schema=f"doc_id {id_type}{extra_fields}, weight double"
    )


def gumbel_key(
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
) -> Column:
    """Deterministic Gumbel-perturbed key, pure JVM columns:
    ``u = (md5-prefix(seed:id) + 0.5) / 2^32`` (never exactly 0 or 1),
    ``key = weight/T - ln(-ln(u))``.  md5 is the portable-hash family
    (``corpus.hash_mod_bucket``): identical integers in Spark and
    DuckDB, reproducible across runs and cluster sizes."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(2**32))
    return F.col(weight_col) / F.lit(float(temperature)) - F.log(-F.log(u))


def dsir_resample(
    weighted: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    seed: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k resampling WITHOUT replacement, proportional to
    ``exp(weight/T)`` (Vieira 2014; the DSIR paper's sampling step):
    add the deterministic Gumbel key and keep the top ``n``.

    ``orderBy(key desc, id).limit(n)`` plans as
    TakeOrderedAndProject — per-partition heaps + a driver merge of
    n-row partials, no global sort at any corpus size.  The id
    tie-break makes the cut deterministic even under (vanishingly
    unlikely) key collisions."""
    keyed = weighted.withColumn(
        "gkey", gumbel_key(weight_col, id_col, seed, temperature)
    )
    return keyed.orderBy(F.col("gkey").desc(), F.col(id_col)).limit(n)
