"""Streaming BM25 ingest: grow the at-rest postings table from a
document stream without ever rebuilding it.

Reference scope: the reference (nshkrdotcom/json_remedy) is a
per-document repair kernel; the retrieval path is graft-mandated.
This applies the IVF delta-batch recipe (``stream_ivf_ingest``) to
the ``search.write_postings_table`` layout, so the searchable corpus
grows with the crawl:

  - each micro-batch tokenizes ITS OWN documents only and lands
    ``deltas/batch=<id>/bucket=*`` with ``mode("overwrite")`` —
    a crashed batch's replay rewrites byte-identical content into its
    own directory (exactly-once without sink transactions; bucket is
    a partition column inside every delta, so query-side term-bucket
    pruning applies to base and deltas alike);
  - per-batch df counts land ``df_deltas/batch=<id>`` and corpus
    stats (n docs, integer sum of dl) land ``stats_deltas/batch=<id>``
    — ``bm25_topk_from_postings`` merges them and re-applies the df
    stopword cap at the MERGED corpus size, which is what a one-shot
    build over the union would have done at write time (query parity
    pytest-pinned; the merged avgdl is an integer-sum ratio, so it
    equals the one-shot average bit-for-bit);
  - ``compact_postings_deltas`` (in ``functions.search``) folds
    deltas into the base offline when the delta count grows.

Contracts shared with the IVF ingest: streamed doc_ids must be NEW
(disjoint from the base and from other batches), and the df cap is
monotone-exclusive — a term the BASE build capped never returns (its
base postings were dropped at write; with a stationary term
distribution df grows with n, so capped stays capped).

Scale notes (100 TB): per batch the work is one tokenize pass + one
(doc, term) aggregate + one repartition(bucket) shuffle of the
MICRO-BATCH only — the existing postings are never read or rewritten.
The batch-local df/stats aggregates are vocabulary- and scalar-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from json_remedy_spark.localdf import local_frame

DOC_SCHEMA = "doc_id long, text string"


def run_postings_ingest_stream(
    spark,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drain ``in_dir`` (availableNow) into ``index_dir``'s delta
    layout.  The postings table must already exist
    (``write_postings_table``) — its stats row pins the bucket count
    the base was hashed with, so streamed terms land in the same
    buckets."""
    from json_remedy_spark.functions.search import _tokens

    srow = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    n_buckets = int(srow["n_buckets"])

    def handle(batch_df, batch_id: int) -> None:
        toks = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        postings = (
            toks.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
            )
            .persist()
        )
        postings.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(os.path.join(index_dir, "deltas", f"batch={batch_id}"))
        # batch-local df (vocabulary-sized) — NO cap here: a
        # batch-local cap would be wrong, the cap is a corpus-level
        # property re-applied at query/compaction over merged counts
        postings.groupBy("term", "bucket").agg(F.count("*").alias("df")).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, "df_deltas", f"batch={batch_id}"))
        stats = (
            postings.select("doc_id", "dl").distinct()
            .agg(F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))
            .first()
        )
        local_frame(
            spark,
            [(int(stats["n"] or 0), int(stats["sum_dl"] or 0))],
            "n long, sum_dl long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "stats_deltas", f"batch={batch_id}")
        )
        postings.unpersist()

    q = (
        spark.readStream.schema(schema or DOC_SCHEMA)
        .parquet(in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
