"""Streaming corpus-pipeline slice: cross-restart drill with
byte-identical kept-set vs the batch path on the same input
(VERDICT r4 #9).  The stream and the batch oracle share the SAME
library operators (quality_filter / normalized_text / dsir_weights),
so the assertion pins the foreachBatch plumbing — batch_id-idempotent
writes, committed-store anti-join, checkpoint restart — not the
operators themselves (those have their own oracles)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window


@pytest.fixture(scope="module")
def corpus_rows(spark):
    from json_remedy_spark.sources.webpages import synthesize_corpus

    docs, labels = synthesize_corpus(spark, 80, partitions=4)
    keep_urls = {
        r["url"] for r in labels.where("expected_keep").select("url").collect()
    }
    return docs.collect(), keep_urls


def _batch_oracle(spark, docs, log_ratio):
    """filter -> min-url-per-hash dedup -> DSIR weight, all batch."""
    from json_remedy_spark.functions.dedup import normalized_text
    from json_remedy_spark.functions.dsir import dsir_weights
    from json_remedy_spark.operators.pipeline import quality_filter

    kept = quality_filter(docs, with_actions=False).where("keep")
    keyed = kept.withColumn("text_hash", F.md5(normalized_text(F.col("text"))))
    rep = (
        keyed.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("text_hash").orderBy("url")),
        )
        .where("_rn = 1")
        .select("url", "text_hash", "text")
    )
    return dsir_weights(
        rep, log_ratio=log_ratio, id_col="url", extra_cols=("text_hash", "text")
    ).withColumnRenamed("doc_id", "url")


def test_stream_corpus_slice_restart_parity_vs_batch(spark, tmp_path, corpus_rows):
    from json_remedy_spark.functions.dsir import (
        bigram_bucket_counts,
        dsir_log_ratio,
        load_log_ratio,
        save_log_ratio,
    )
    from json_remedy_spark.streaming.stream_corpus import (
        read_slice_output,
        run_corpus_slice_stream,
    )

    rows, keep_urls = corpus_rows
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    half1, half2 = rows[:40], rows[40:]

    # a batch-2 duplicate of a SURVIVING batch-1 doc, under a url that
    # sorts after the original — both the stream (first-batch-wins)
    # and the batch oracle (min-url rep) must keep the original
    src_row = next(r for r in half1 if r["url"] in keep_urls)
    dup = (
        "zzz-dup-" + src_row["url"],
        src_row["warc_ts"],
        src_row["html"],
        src_row["text"],
        src_row["lang"],
    )
    to_tuple = lambda r: (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
    batch1 = spark.createDataFrame([to_tuple(r) for r in half1], schema)
    batch2 = spark.createDataFrame([to_tuple(r) for r in half2] + [dup], schema)
    full = batch1.unionByName(batch2)

    # fit the DSIR ratio once (target = the corpus's own en slice) and
    # persist the at-rest artifact the stream will load
    lr = dsir_log_ratio(
        bigram_bucket_counts(full.where("lang = 'en'").limit(20)),
        bigram_bucket_counts(full),
    )
    lr_path = str(tmp_path / "log_ratio.parquet")
    save_log_ratio(lr, lr_path)

    oracle = sorted(
        map(tuple, _batch_oracle(spark, full, load_log_ratio(lr_path)).collect())
    )
    assert len(oracle) >= 10  # the drill is non-vacuous
    oracle_urls = {t[0] for t in oracle}
    assert dup[0] not in oracle_urls and src_row["url"] in oracle_urls

    src, out, ckpt, store = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "store")
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    run_corpus_slice_stream(spark, src, out, ckpt, store, lr_path)
    got1 = sorted(map(tuple, read_slice_output(spark, out).collect()))
    assert {t[0] for t in got1} <= oracle_urls

    # restart from the checkpoint with the second file appended: only
    # batch 2 processes; the duplicate must hit the at-rest store
    batch2.coalesce(1).write.mode("append").parquet(src)
    run_corpus_slice_stream(spark, src, out, ckpt, store, lr_path)
    got = sorted(map(tuple, read_slice_output(spark, out).collect()))

    assert got == oracle  # urls, hashes, texts AND float weights


def test_stream_corpus_slice_min_weight_gate(spark, tmp_path, corpus_rows):
    """The streaming analogue of Gumbel selection: a stateless
    min-weight gate — output is exactly the ungated kept-set filtered
    on weight."""
    import numpy as np

    from json_remedy_spark.functions.dsir import save_log_ratio
    from json_remedy_spark.streaming.stream_corpus import (
        read_slice_output,
        run_corpus_slice_stream,
    )

    rows, _ = corpus_rows
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    docs = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows[:40]],
        schema,
    )
    # a deterministic non-trivial ratio: +/- alternating by bucket
    from json_remedy_spark.functions.langid import FT_BUCKETS

    lr = ((np.arange(FT_BUCKETS) % 2) * 2 - 1) * 1e-3
    lr_path = str(tmp_path / "lr.parquet")
    save_log_ratio(lr, lr_path)

    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)

    ungated_out = str(tmp_path / "out_all")
    run_corpus_slice_stream(
        spark, src, ungated_out, str(tmp_path / "ck1"), str(tmp_path / "st1"), lr_path
    )
    all_rows = read_slice_output(spark, ungated_out).collect()
    assert all_rows
    cut = sorted(r["weight"] for r in all_rows)[len(all_rows) // 2]

    gated_out = str(tmp_path / "out_gated")
    run_corpus_slice_stream(
        spark, src, gated_out, str(tmp_path / "ck2"), str(tmp_path / "st2"),
        lr_path, min_weight=cut,
    )
    gated = {r["url"] for r in read_slice_output(spark, gated_out).collect()}
    assert gated == {r["url"] for r in all_rows if r["weight"] >= cut}
    assert 0 < len(gated) < len(all_rows)
