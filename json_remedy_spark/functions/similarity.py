"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk``         — brute-force exact top-k per query
  (``F.aggregate``/``zip_with`` dot products, JVM-side; a window takes
  the top k).  The correctness baseline.
* ``lsh_bucketed_topk``   — random-hyperplane LSH buckets: candidates
  share a sign-pattern bucket, exact cosine only within the bucket.
  The 100 TB path: the cross join collapses from |Q|x|N| to per-bucket
  blocks; planes are deterministic (seeded md5 of dimension index).
* ``embedding_near_dup``  — self-join variant: pairs with cosine >= t.

All use ``F.round(.., 6)`` on output scores so DuckDB oracles compare
cleanly despite float32/float64 accumulation-order differences.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (F.greatest(_norm(a) * _norm(b), F.lit(1e-12)))


def with_unit_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Pre-normalize once; downstream cosine becomes a plain dot."""
    a = F.col(col)
    n = F.greatest(_norm(a), F.lit(1e-12))
    return df.withColumn("unit", F.transform(a, lambda v: v / n))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query side, rank
    per query.  Scale note: |Q| small => broadcast-nested-loop with a
    codegen'd dot product; the heavy side streams once, no shuffle of
    the corpus."""
    v = with_unit_norm(vectors, col).select(F.col(id_col).alias("vec_id"), F.col("unit").alias("v_unit"))
    q = with_unit_norm(queries, col).select(F.col(q_id_col).alias("q_id"), F.col("unit").alias("q_unit"))
    scored = v.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        F.round(_dot(F.col("v_unit"), F.col("q_unit")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


N_PLANES = 8


def _plane_component(dim_idx, plane: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5(plane:dim) -> 32-bit uniform."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(plane)), dim_idx.cast("string"))), 1, 8), 16, 10)
    return (h.cast("double") / F.lit(float(2**31)) - F.lit(1.0))


def lsh_bucket(col) -> "F.Column":
    """Sign pattern over N_PLANES deterministic hyperplanes -> int bucket."""
    bucket = F.lit(0)
    for p in range(N_PLANES):
        proj = F.aggregate(
            F.zip_with(
                col,
                F.transform(F.sequence(F.lit(0), F.size(col) - 1), lambda i: _plane_component(i, p)),
                lambda v, w: v * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    col: str = "embedding",
) -> DataFrame:
    """ANN: exact cosine only among bucket-mates (recall < 1 by design)."""
    v = with_unit_norm(vectors, col).select(
        F.col(id_col).alias("vec_id"), F.col("unit").alias("v_unit"), lsh_bucket(F.col(col)).alias("bucket")
    )
    q = with_unit_norm(queries, col).select(
        F.col(q_id_col).alias("q_id"), F.col("unit").alias("q_unit"), lsh_bucket(F.col(col)).alias("bucket")
    )
    scored = v.join(F.broadcast(q), "bucket").select(
        "q_id", "vec_id", F.round(_dot(F.col("v_unit"), F.col("q_unit")), 6).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup(
    vectors: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", col: str = "embedding"
) -> DataFrame:
    """Self-join near-duplicate pairs via LSH buckets (scale path) —
    cosine >= threshold, a < b."""
    v = with_unit_norm(vectors, col).select(
        F.col(id_col).alias("id"), F.col("unit"), lsh_bucket(F.col(col)).alias("bucket")
    )
    pairs = (
        v.alias("a")
        .join(v.alias("b"), "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(_dot(F.col("a.unit"), F.col("b.unit")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .distinct()
    )
    return pairs
