"""Streaming BM25 postings ingest: restart drill + equality with a
one-shot build over the union corpus, before AND after compaction.
The stream shares the batch tokenize/df/stats math, so the assertions
pin the delta plumbing — batch-idempotent writes, merged df/stats with
the cap re-applied at merged scale, offline compaction that leaves the
table content-equal to a fresh one-shot build."""

import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def queries(spark):
    rows = [(0, "hash join merge"), (1, "slow vector scan"), (2, "customer data batch filter")]
    return spark.createDataFrame(rows, "q_id long, query string")


def _topk(spark, idx, queries):
    from json_remedy_spark.functions.search import bm25_topk_from_postings

    return sorted(
        map(tuple, bm25_topk_from_postings(spark, idx, queries, k=10).collect())
    )


def test_stream_postings_ingest_restart_and_compaction(spark, tmp_path, docs, queries):
    from json_remedy_spark.functions.search import (
        compact_postings_deltas,
        write_postings_table,
    )
    from json_remedy_spark.streaming.stream_postings_ingest import (
        run_postings_ingest_stream,
    )

    base = docs.where("doc_id % 3 = 0")
    wave1 = docs.where("doc_id % 3 = 1")
    wave2 = docs.where("doc_id % 3 = 2")

    # max_df_frac=1.0: the synthetic corpus draws from a ~40-term
    # vocabulary where every term tops the production 0.5 stopword
    # cap (same note as the bm25_topk oracle query)
    idx = str(tmp_path / "postings_stream")
    write_postings_table(base, idx, n_buckets=8, max_df_frac=1.0)

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    wave1.coalesce(1).write.mode("append").parquet(src)
    run_postings_ingest_stream(spark, src, idx, ckpt)

    # restart from the checkpoint with a second file: only wave2
    # processes (wave1 postings are not doubled)
    wave2.coalesce(1).write.mode("append").parquet(src)
    run_postings_ingest_stream(spark, src, idx, ckpt)

    oneshot = str(tmp_path / "postings_oneshot")
    write_postings_table(docs, oneshot, n_buckets=8, max_df_frac=1.0)
    want = _topk(spark, oneshot, queries)
    assert _topk(spark, idx, queries) == want and want

    # compaction folds the deltas; queries unchanged; the TABLE itself
    # becomes content-equal to the one-shot build (stats, df, postings)
    assert compact_postings_deltas(spark, idx) == 2
    for d in ("deltas", "df_deltas", "stats_deltas"):
        assert not os.path.exists(os.path.join(idx, d))
    assert _topk(spark, idx, queries) == want

    def rows(path, sub, cols):
        return sorted(
            map(tuple, spark.read.parquet(os.path.join(path, sub)).select(*cols).collect())
        )

    assert rows(idx, "stats", ["n", "avgdl", "sum_dl", "n_buckets", "max_df_frac"]) == \
        rows(oneshot, "stats", ["n", "avgdl", "sum_dl", "n_buckets", "max_df_frac"])
    assert rows(idx, "df", ["term", "df", "bucket"]) == rows(oneshot, "df", ["term", "df", "bucket"])
    assert rows(idx, "postings", ["term", "doc_id", "tf", "dl", "bucket"]) == \
        rows(oneshot, "postings", ["term", "doc_id", "tf", "dl", "bucket"])

    assert compact_postings_deltas(spark, idx) == 0  # no-op when empty


def test_stream_postings_df_cap_merged_scale(spark, tmp_path):
    """The stopword cap re-applies at MERGED corpus size while deltas
    are live: a term under the cap in the base but pushed over it by
    streamed growth stops scoring — exactly what a one-shot build over
    the union would have dropped at write time."""
    from json_remedy_spark.functions.search import (
        bm25_topk_from_postings,
        write_postings_table,
    )
    from json_remedy_spark.streaming.stream_postings_ingest import (
        run_postings_ingest_stream,
    )

    base_rows = [(1, "common rare alpha"), (2, "common beta"), (3, "gamma delta"),
                 (4, "epsilon zeta"), (5, "eta theta")]
    # the stream floods 'common': base df 2/5 -> merged df 7/10 > 0.5
    wave_rows = [(10 + i, "common filler" + str(i)) for i in range(5)]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    wave = spark.createDataFrame(wave_rows, "doc_id long, text string")

    idx = str(tmp_path / "cap_idx")
    write_postings_table(base, idx, n_buckets=4, max_df_frac=0.5)
    src, ckpt = str(tmp_path / "cap_src"), str(tmp_path / "cap_ckpt")
    wave.coalesce(1).write.parquet(src)
    run_postings_ingest_stream(spark, src, idx, ckpt)

    q = spark.createDataFrame([(0, "common rare")], "q_id long, query string")
    got = bm25_topk_from_postings(spark, idx, q, k=10).collect()
    # 'common' is capped at merged scale: only 'rare' scores -> doc 1
    assert {r["doc_id"] for r in got} == {1}
