"""Streaming ANN ingest: grow the at-rest IVF index from a vector
stream without ever rebuilding it.

Reference scope: the reference (nshkrdotcom/json_remedy) is a
per-document repair kernel; the similarity path is graft-mandated.
This is the incremental form of ``similarity.append_to_ivf_index``,
sharing the SAME assignment kernel (``_write_assigned_cells`` against
the STORED centroids) so stream and batch cannot drift.

Exactly-once layout (the ``stream_corpus`` recipe applied to an
index): a plain ``mode("append")`` into ``vectors/cell=*`` would
double every vector when a crashed micro-batch replays.  Instead each
batch lands under ``deltas/batch=<id>/cell=*`` with
``mode("overwrite")`` — a replay rewrites byte-identical content into
its own directory, so the result is idempotent with no sink
transactions.  ``read_index_vectors`` unions base + deltas (both
layouts carry ``cell`` as a partition column, so probed-cell pruning
applies to both scans), and ``compact_ivf_deltas`` folds deltas into
the base offline when the delta count grows.

Scale notes (100 TB): per batch the work is one centroid-matmul map
pass plus one ``repartition(cell)`` shuffle of the MICRO-BATCH only —
the existing index is never read or rewritten.  Centroids are loaded
once per ``run`` (they only change on an offline re-fit, which
versions the index).  Quantized (sq8) indexes are detected from the
stored schema, so streamed deltas match the base layout
automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

VECTOR_SCHEMA = "vec_id long, embedding array<double>"


def run_ivf_ingest_stream(
    spark,
    in_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> None:
    """Drain ``in_dir`` (availableNow) into ``index_dir``'s delta
    layout.  The index must already exist (``write_ivf_index``) — the
    centroids define the cells a streamed vector can land in."""
    from json_remedy_spark.functions.similarity import (
        _write_assigned_cells,
        detect_index_quantize,
        read_ivf_centroids,
    )

    cen = read_ivf_centroids(spark, index_dir)
    # shared 3-way layout detector (float / sq8 / pq) — streamed
    # deltas always match the base layout, codebooks included
    quantize, books = detect_index_quantize(spark, index_dir)

    def handle(batch_df, batch_id: int) -> None:
        src = batch_df.select(F.col(id_col).alias("vec_id"), F.col(col).alias(col))
        _write_assigned_cells(
            src, cen, col, index_dir, "overwrite",
            quantize=quantize, books=books,
            subdir=os.path.join("deltas", f"batch={batch_id}"),
        )

    q = (
        spark.readStream.schema(schema or VECTOR_SCHEMA)
        .parquet(in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
