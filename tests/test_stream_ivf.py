"""Streaming IVF ingest: restart drill + equality with the batch
append path and with a one-shot union build (same centroids).  The
stream shares the batch assignment kernel, so the assertions pin the
delta plumbing — batch-idempotent writes, base+delta union reads,
offline compaction — not the assignment math (that has its own
oracle, ``ivf_append_topk``)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def vecs(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return e.select("vec_id", "embedding").cache()


def _topk(spark, idx, q):
    from json_remedy_spark.functions.similarity import ivf_topk_from_index

    return sorted(map(tuple, ivf_topk_from_index(spark, idx, q, k=5, probes=3).collect()))


def test_stream_ivf_ingest_restart_and_compaction(spark, tmp_path, vecs):
    from json_remedy_spark.functions.similarity import (
        compact_ivf_deltas,
        read_index_vectors,
        read_ivf_centroids,
        write_ivf_index,
    )
    from json_remedy_spark.streaming.stream_ivf_ingest import run_ivf_ingest_stream

    base = vecs.where("vec_id % 3 = 0")
    wave1 = vecs.where("vec_id % 3 = 1")
    wave2 = vecs.where("vec_id % 3 = 2")
    q = vecs.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")

    idx = str(tmp_path / "ivf_stream")
    write_ivf_index(base, idx, cells=8)
    cen = read_ivf_centroids(spark, idx)

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    wave1.coalesce(1).write.mode("append").parquet(src)
    run_ivf_ingest_stream(spark, src, idx, ckpt)

    # restart from the checkpoint with a second file: only wave2
    # processes (wave1 is not doubled)
    wave2.coalesce(1).write.mode("append").parquet(src)
    run_ivf_ingest_stream(spark, src, idx, ckpt)

    n = vecs.count()
    stored = read_index_vectors(spark, idx)
    assert stored.count() == n
    assert stored.select("vec_id").distinct().count() == n

    # equality with a one-shot build over everything, same centroids
    oneshot = str(tmp_path / "ivf_oneshot")
    write_ivf_index(vecs, oneshot, cells=8, centroids=cen)
    want = _topk(spark, oneshot, q)
    assert _topk(spark, idx, q) == want and want

    # compaction folds the deltas; queries are unchanged
    import os
    assert compact_ivf_deltas(spark, idx) == 2
    assert not os.path.exists(os.path.join(idx, "deltas"))
    assert _topk(spark, idx, q) == want
    assert read_index_vectors(spark, idx).count() == n
    assert compact_ivf_deltas(spark, idx) == 0  # no-op when empty


def test_stream_ivf_ingest_quantized_layout(spark, tmp_path, vecs):
    """Streamed deltas into an sq8 index quantize to match the base."""
    from json_remedy_spark.functions.similarity import (
        read_index_vectors,
        write_ivf_index,
    )
    from json_remedy_spark.streaming.stream_ivf_ingest import run_ivf_ingest_stream

    idx = str(tmp_path / "ivf_sq8")
    write_ivf_index(vecs.where("vec_id % 2 = 0"), idx, cells=8, quantize="sq8")
    src = str(tmp_path / "src")
    vecs.where("vec_id % 2 = 1").coalesce(1).write.parquet(src)
    run_ivf_ingest_stream(spark, src, idx, str(tmp_path / "ckpt"))
    stored = read_index_vectors(spark, idx)
    assert set(stored.columns) == {"vec_id", "codes", "scale", "cell"}
    assert stored.count() == vecs.count()


def test_stream_ivf_ingest_pq_layout(spark, tmp_path, vecs):
    """Streamed deltas into a PQ index encode against the STORED
    codebooks — byte-identical codes to the batch append path for the
    same vectors (the shared detect_index_quantize contract)."""
    import shutil

    from json_remedy_spark.functions.similarity import (
        PQ_M,
        append_to_ivf_index,
        read_index_vectors,
        write_ivf_index,
    )
    from json_remedy_spark.streaming.stream_ivf_ingest import run_ivf_ingest_stream

    idx = str(tmp_path / "ivf_pq")
    base, wave = vecs.where("vec_id % 2 = 0"), vecs.where("vec_id % 2 = 1")
    write_ivf_index(base, idx, cells=8, quantize="pq")
    copy = str(tmp_path / "ivf_pq_copy")
    shutil.copytree(idx, copy)

    src = str(tmp_path / "src_pq")
    wave.coalesce(1).write.parquet(src)
    run_ivf_ingest_stream(spark, src, idx, str(tmp_path / "ckpt_pq"))

    stored = read_index_vectors(spark, idx)
    assert set(stored.columns) == {"vec_id", "codes", "cell"}
    assert stored.count() == vecs.count()
    assert all(len(r["codes"]) == PQ_M for r in stored.limit(5).collect())

    # batch append on the copy produces the SAME codes and cells
    append_to_ivf_index(spark, copy, wave)
    got = sorted(map(tuple, read_index_vectors(spark, idx).collect()))
    want = sorted(map(tuple, read_index_vectors(spark, copy).collect()))
    assert got == want
