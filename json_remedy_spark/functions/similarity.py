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


def _plane_matrix(dims: int):
    """Deterministic hyperplanes: md5(plane:dim) -> uniform [-1, 1).
    Computed once driver/worker-side with numpy (the column-expression
    formulation recomputed md5 per row x dim x plane, interpreted)."""
    import hashlib

    import numpy as np

    m = np.empty((dims, N_PLANES), dtype=np.float64)
    for p in range(N_PLANES):
        for d in range(dims):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            m[d, p] = h / float(2**31) - 1.0
    return m


def with_lsh_bucket(df: DataFrame, col: str = "embedding", out: str = "bucket") -> DataFrame:
    """Sign pattern over N_PLANES deterministic hyperplanes -> int
    bucket, vectorized: one numpy matmul per Arrow batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array(vecs.tolist(), dtype=np.float64)
        planes = _plane_matrix(mat.shape[1])
        signs = (mat @ planes) > 0
        weights = (1 << np.arange(N_PLANES)).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32"))

    return df.withColumn(out, bucket_udf(F.col(col)))


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    col: str = "embedding",
) -> DataFrame:
    """ANN: exact cosine only among bucket-mates (recall < 1 by design)."""
    v = with_lsh_bucket(with_unit_norm(vectors, col), col).select(
        F.col(id_col).alias("vec_id"), F.col("unit").alias("v_unit"), "bucket"
    )
    q = with_lsh_bucket(with_unit_norm(queries, col), col).select(
        F.col(q_id_col).alias("q_id"), F.col("unit").alias("q_unit"), "bucket"
    )
    scored = v.join(F.broadcast(q), "bucket").select(
        "q_id", "vec_id", F.round(_dot(F.col("v_unit"), F.col("q_unit")), 6).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


N_IVF_CELLS = 16
N_IVF_PROBES = 4


def _ivf_centroids(vectors: DataFrame, col: str, cells: int):
    """Deterministic centroids: the ``cells`` vectors with the smallest
    md5(vec_id) act as seeds (k-means++ without iteration — adequate
    for routing, reproducible, no fit step to ship)."""
    import numpy as np

    seed_rows = (
        vectors.select(F.col(col).alias("v"), F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(cells)
        .collect()
    )
    return np.array([r["v"] for r in seed_rows], dtype=np.float64)


def with_ivf_cell(df: DataFrame, centroids, col: str = "embedding", n_probes: int = 1) -> DataFrame:
    """Assign each vector its nearest centroid cell(s) — numpy matmul
    per Arrow batch; ``n_probes``>1 explodes a row into its closest
    cells (query-side fanout)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cen = np.asarray(centroids, dtype=np.float64)
    cen_unit = cen / np.maximum(np.linalg.norm(cen, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def cells_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cen_unit.T
        order = np.argsort(-sims, axis=1)[:, :n_probes]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return df.withColumn("ivf_cells", cells_udf(F.col(col)))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    col: str = "embedding",
    cells: int = N_IVF_CELLS,
    probes: int = N_IVF_PROBES,
) -> DataFrame:
    """IVF ANN: corpus vectors live in 1 cell, queries probe their
    ``probes`` nearest cells; exact cosine only within probed cells.
    At 100 TB the corpus side is written bucketed by cell so a query
    touches cells/probes of the data."""
    centroids = _ivf_centroids(vectors, col, cells)
    v = with_ivf_cell(with_unit_norm(vectors, col), centroids, col, n_probes=1).select(
        F.col(id_col).alias("vec_id"),
        F.col("unit").alias("v_unit"),
        F.explode("ivf_cells").alias("cell"),
    )
    q = with_ivf_cell(with_unit_norm(queries, col), centroids, col, n_probes=probes).select(
        F.col(q_id_col).alias("q_id"),
        F.col("unit").alias("q_unit"),
        F.explode("ivf_cells").alias("cell"),
    )
    scored = v.join(F.broadcast(q), "cell").select(
        "q_id", "vec_id", F.round(_dot(F.col("v_unit"), F.col("q_unit")), 6).alias("cos")
    ).groupBy("q_id", "vec_id").agg(F.max("cos").alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup(
    vectors: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", col: str = "embedding"
) -> DataFrame:
    """Self-join near-duplicate pairs via LSH buckets (scale path) —
    cosine >= threshold, a < b."""
    v = with_lsh_bucket(with_unit_norm(vectors, col), col).select(
        F.col(id_col).alias("id"), F.col("unit"), "bucket"
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
