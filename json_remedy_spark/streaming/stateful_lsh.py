"""Streaming FUZZY dedup: minhash-LSH candidate detection over a
document stream via band-keyed ``applyInPandasWithState``.

Extends the stateful exact dedup (stateful_dedup.py) to near-
duplicates — the reference's stream surface is stateless per-item
(lib/json_remedy.ex:204-216); this operator is graft-mandated scale
plumbing, not reference parity.

Shape:

1. The batch signature kernel lifts to streaming UNCHANGED —
   ``minhash_signatures`` / ``banded_signatures`` are stateless
   mapInPandas / explode stages, so the exact same affine minhash
   family (functions/dedup.py) produces the exact same (band, bucket)
   keys batch and stream.
2. State is keyed by (band, bucket): one representative doc_id per
   occupied bucket (the smallest doc_id ever seen there — smallest,
   not first-in-shuffle-order, so output is deterministic).  Every
   later doc landing in an occupied bucket emits a candidate pair
   ``(doc_id, rep_doc_id)`` — the streaming analogue of
   ``lsh_candidate_pairs``, with the bucket representative standing in
   for the full within-bucket self-join (state stays O(1) per bucket,
   not O(docs)).
3. A doc is a near-dup candidate if ANY band collides, so consumers
   ``dropDuplicates(["doc_id", "rep_doc_id"])`` downstream (pairs can
   arrive once per colliding band); exact jaccard verification runs in
   batch over the emitted candidates (``jaccard_pairs`` on the pair
   set), mirroring the batch ``lsh_verified_pairs`` recipe.

Scale: state is one (long, long) per occupied bucket, shuffled to a
stable state partition by the bucket key.  At 10^12 docs pair with a
GroupStateTimeout TTL or periodic state compaction, same as the exact
operator.
"""

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from json_remedy_spark.functions.dedup import banded_signatures, minhash_signatures

OUTPUT_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bucket", StringType()),
        StructField("doc_id", LongType()),
        StructField("rep_doc_id", LongType()),
    ]
)
# (representative doc_id, total docs routed to this bucket)
STATE_SCHEMA = StructType([StructField("rep", LongType()), StructField("n_seen", LongType())])


def _make_lsh_fn(ttl_minutes: int | None):
    def _lsh_fn(key, pdfs, state):
        import pandas as pd

        if ttl_minutes is not None and state.hasTimedOut:
            # TTL expiry: forget this bucket's representative — docs
            # older than the window stop being dedup anchors (bounded
            # state; the standard streaming-dedup trade)
            state.remove()
            return
        band, bucket = key
        rep, n_seen = (state.get[0], state.get[1]) if state.exists else (None, 0)
        ids = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"].dropna())
        if not ids:
            return
        ids.sort()
        n_new = len(ids)
        if rep is None:
            rep, ids = ids[0], ids[1:]
        state.update((rep, n_seen + n_new))
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))
        if ids:
            yield pd.DataFrame(
                {
                    "band": [band] * len(ids),
                    "bucket": [bucket] * len(ids),
                    "doc_id": ids,
                    "rep_doc_id": [rep] * len(ids),
                }
            )

    return _lsh_fn


def stream_bucket_near_dup(keyed: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """Generic bucket-keyed stateful near-dup core: a ``(band:int,
    bucket:string, doc_id:long)`` stream (ANY bucketing family — minhash
    bands, hyperplane sign patterns, ...) -> candidate pairs against
    each bucket's representative.  Both concrete operators below are
    this plus a stateless bucketing prefix."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("band", "bucket").applyInPandasWithState(
        _make_lsh_fn(ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def stream_lsh_near_dup(docs: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """(doc_id, text) stream -> (band, bucket, doc_id, rep_doc_id)
    candidate-pair stream (stateful, checkpoint-durable).

    ``ttl_minutes`` bounds state at production scale: a bucket whose
    representative hasn't been refreshed within the TTL is evicted
    (processing-time timeout), so state is O(buckets active in the
    window) instead of O(all buckets ever).  Default None = exact
    dedup against all history (sandbox/tests).

    CAVEAT (observed on Spark 4.1 local mode): a TTL'd query must run
    under a real trigger (``processingTime=...``) — ``availableNow``
    cannot terminate while processing-time timeouts are registered and
    hangs after draining the input.  TTL is a continuous-stream
    feature; batch drains should pass ``ttl_minutes=None``."""
    banded = banded_signatures(minhash_signatures(docs))
    return stream_bucket_near_dup(banded, ttl_minutes)


def stream_embedding_near_dup(
    vectors: DataFrame,
    ttl_minutes: int | None = None,
    n_tables: int | None = None,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding) stream -> candidate near-dup pairs via the
    SAME multi-table hyperplane banding as the batch
    ``embedding_near_dup`` (stateless unit-norm + sign-pattern stages
    lift to streaming unchanged; table index becomes the band key).
    Completes the dedup matrix: exact, minhash-LSH, and embedding
    near-dup all have batch AND streaming forms.  Exact-cosine
    verification runs in batch over the emitted pairs, mirroring the
    jaccard verify of the minhash path.  Scale: n_planes ~ log2(N)
    (``recommended_planes``), state O(occupied buckets); TTL bounds it
    on continuous streams."""
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.similarity import (
        N_PLANES,
        N_TABLES,
        with_lsh_tables,
        with_unit_norm,
    )

    keyed = (
        with_lsh_tables(
            with_unit_norm(vectors, col),
            "unit",
            n_tables or N_TABLES,
            n_planes or N_PLANES,
        )
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode("tables").alias("band", "bucket"),
        )
        .select("band", F.col("bucket").cast("string").alias("bucket"), "doc_id")
    )
    return stream_bucket_near_dup(keyed, ttl_minutes)


def run_once(spark, in_dir: str, out_dir: str, checkpoint_dir: str) -> None:
    """Drain available input (parquet files of doc_id:long, text:string)
    and append candidate pairs to ``out_dir``."""
    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    docs = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        stream_lsh_near_dup(docs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
