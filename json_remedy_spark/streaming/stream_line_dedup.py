"""Streaming boilerplate removal: global line-level dedup over a page
stream — the streaming analogue of ``corpus.line_dedup``.

Shape: ``foreachBatch`` + an AT-REST seen-lines store (the same
idempotent per-batch-subdir pattern as the LSH signature table,
``functions/dedup.py:write_signature_table``), not a chained stateful
operator: reassembling documents after a per-line
``applyInPandasWithState`` would need a second stateful aggregation
downstream, which append-mode streaming only finalizes behind a
watermark — a latency tax with no correctness gain here.  Per
micro-batch:

1. read the union of every OTHER batch's hash subdir (replays of the
   CURRENT batch id overwrite their own subdir, so a crashed batch
   re-runs with exactly the pre-crash state — idempotent end-to-end);
2. ``line_dedup_incremental``: drop store-seen lines, first-occurrence
   winner selection within the batch (deterministic (doc, line_no)
   order), reassemble;
3. overwrite ``out/batch=<id>`` with the deduped pages and
   ``store/batch=<id>`` with the batch's new distinct hashes.

State growth is one 32-hex row per distinct line ever seen; at
10^12-doc scale the store is a bucketed table and step 1's union is a
broadcast-or-shuffle join identical to the batch operator's
``seen_hashes`` path.  No reference analogue (the reference streams
repairs only, repair_stream/2) — this is a graft-mandated corpus op
lifted to streaming.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

# canonical web-page input shape (BASELINE.json input_hint)
PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def run_line_dedup_stream(
    spark,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    schema: str | None = None,
    min_line_chars: int = 1,
    use_bloom: bool = False,
    bloom_bits: int = 1 << 20,
    bloom_hashes: int = 4,
) -> None:
    """Drain ``in_dir`` (availableNow) through the streaming line
    dedup; deduped pages land under ``out_dir/batch=<id>/``, the
    seen-line store under ``store_dir/batch=<id>/``.

    ``use_bloom=True`` keeps an in-memory bloom over the store across
    batches: built once from the at-rest subdirs at the first batch of
    the run, then OR-updated with each batch's new hashes — so the
    per-batch store anti-join only processes bloom HITS (true dupes +
    false positives); definitely-new lines never shuffle against the
    store.  Exactness is unaffected (see line_dedup_incremental):
    a replayed batch sees a superset bloom and its lines simply take
    the exact-join path."""
    import numpy as np

    from json_remedy_spark.functions.corpus import line_dedup_incremental
    from json_remedy_spark.functions.dedup import bloom_positions, build_bloom

    state: dict = {"bloom": None}

    def _positions(df) -> "np.ndarray":
        rows = df.select(
            F.explode(
                bloom_positions(F.col("line_hash"), bloom_bits, bloom_hashes)
            ).alias("p")
        ).distinct().collect()
        return np.array([r["p"] for r in rows], dtype=np.int64)

    def handle(batch_df, batch_id: int) -> None:
        others = [
            p
            for p in glob.glob(os.path.join(store_dir, "batch=*"))
            if not p.endswith(f"batch={batch_id}")
        ]
        seen = spark.read.parquet(*others) if others else None
        bloom = None
        if use_bloom and seen is not None:
            if state["bloom"] is None:
                state["bloom"] = build_bloom(
                    seen.select("line_hash"), "line_hash", bloom_bits, bloom_hashes
                )
            bloom = (state["bloom"], bloom_bits, bloom_hashes)
        pages = batch_df.select("url", "text")
        batch_handles: list = []
        deduped, new_hashes = line_dedup_incremental(
            pages, seen, id_col="url", text_col="text",
            min_line_chars=min_line_chars, seen_bloom=bloom,
            handles=batch_handles,
        )
        out = (
            batch_df.drop("text", "html")
            .join(deduped.withColumnRenamed("doc_id", "url"), "url")
            .withColumn("html", F.encode(F.col("text"), "utf-8"))
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))
        new_hashes.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch={batch_id}")
        )
        if use_bloom and state["bloom"] is not None:
            import numpy as np

            idx = _positions(
                spark.read.parquet(os.path.join(store_dir, f"batch={batch_id}"))
            )
            if len(idx):
                np.bitwise_or.at(
                    state["bloom"], idx >> 3, (1 << (idx & 7)).astype("uint8")
                )
        for h in batch_handles:
            h.unpersist()

    q = (
        spark.readStream.schema(schema or PAGE_SCHEMA)
        .parquet(in_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_deduped(spark, out_dir: str):
    """All committed batches of the deduped output."""
    return spark.read.parquet(os.path.join(out_dir, "batch=*"))
