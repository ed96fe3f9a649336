"""Deduplication operators for training-data pipelines.

All portable-hash based (md5 of strings) so every variant has an exact
DuckDB oracle — no platform-specific hash functions in the contract
surface.

* exact          — hash-groupBy on normalized text (one shuffle on a
                   32-hex key; partial agg map-side).
* minhash LSH    — shingle -> k minhashes -> b bands -> bucket join.
                   Scale path: candidate pairs only materialize within
                   a band bucket (self-join on (band, bucket_sig)),
                   never the full cross product.
* ngram jaccard  — exact verification on candidate pairs (or, at small
                   scale, all intersecting pairs via shingle self-join).
* simhash        — 32-bit sign-of-weighted-bits fingerprint; hamming
                   band join.
* embedding near-dup — see similarity.py (cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_WORDS = 3
MINHASH_K = 12
LSH_BANDS = 4  # 4 bands x 3 rows


def normalized_text(col):
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One representative (min id) per identical normalized text."""
    return (
        docs.groupBy(F.md5(normalized_text(F.col(text_col))).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Explode each doc into its w-word shingle set (distinct)."""
    w = F.split(normalized_text(F.col(text_col)), " ")
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - SHINGLE_WORDS, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, SHINGLE_WORDS)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.array_distinct(sh).alias("sh"))
        .select("doc_id", F.explode("sh").alias("shingle"))
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """k minhashes per doc via Kirsch-Mitzenmacher double hashing:
    one md5 per shingle -> (h1, h2) 48-bit halves -> h_k = h1 + k*h2.

    12x fewer digest computations than per-seed md5, still portable
    (the DuckDB oracle reproduces the exact integers from the same hex
    string).  One shuffle (groupBy doc), partial min map-side.
    """
    sh = shingles(docs, id_col, text_col)
    hx = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 13, 12), 16, 10).cast("long")
    sh = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min(F.col("h1") + F.lit(k) * F.col("h2")).alias(f"mh{k}")
        for k in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Banded LSH: docs sharing any band signature are candidates.

    Bands come from one ``explode`` over the signature row (not a
    union of per-band scans — a union would recompute the minhash
    aggregation once per band per join side)."""
    sig = minhash_signatures(docs, id_col, text_col)
    rows_per_band = MINHASH_K // LSH_BANDS
    band_structs = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("bucket")))
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over all shingle-sharing pairs.

    |A ∩ B| via shingle self-join; |A ∪ B| = |A| + |B| - |A ∩ B|.
    At scale this runs on LSH candidates only; standalone it is the
    exact (quadratic-in-colliding-docs) verifier.

    ``max_shingle_df`` drops shingles appearing in more than N docs —
    the standard stop-shingle guard: a boilerplate phrase shared by 1M
    docs would otherwise produce a 10^12-row join block.
    """
    sh = shingles(docs, id_col, text_col)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard", F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 32


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash from word tokens.

    Each token hashes to 32 bits via md5 prefix; fingerprint bit j is
    set iff more tokens have bit j set than clear.  Pure column algebra
    (explode + groupBy + bit ops): one shuffle.
    """
    w = F.split(normalized_text(F.col(text_col)), " ")
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(w).alias("token"))
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    tok = tok.select("doc_id", h.alias("h"))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(((F.col("h").bitwiseAND(F.lit(1 << j))) != 0).cast("int") * 2 - 1).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        fp = fp + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(0)
    return bit_sums.select("doc_id", fp.alias("simhash"))
