"""Structured Streaming repair — the reference ``repair_stream/2``
(lib/json_remedy.ex:204-216) re-expressed.

The reference stream is stateless per-item (map + filter-errors).  The
Spark translation is therefore append-mode with **no stateful
operators**: readStream -> the same quality_filter column stages ->
writeStream.  Failed repairs are dropped, matching the reference's
silent-drop semantics.

``repair_stream_from_files`` tails a directory of text files (one doc
per line); ``run_once`` drains with trigger=availableNow for tests —
identical code path to a continuous run.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.repair_udf import make_repair_udf


def repair_stream(lines: DataFrame, drop_failures: bool = True, **repair_opts) -> DataFrame:
    """text column -> repaired docs (stateless; reference semantics).
    ``repair_opts`` forward to the kernel exactly like the reference's
    ``repair_stream(stream, opts)`` (lib/json_remedy.ex:204-216)."""
    r = make_repair_udf(**repair_opts)(F.col("text"))
    out = lines.withColumn("r", r).select(
        "text",
        F.col("r.repaired").alias("repaired"),
        F.col("r.ok").alias("ok"),
        F.col("r.n_repairs").alias("n_repairs"),
    )
    if drop_failures:
        out = out.where(F.col("ok") & (F.col("repaired") != F.lit('""')))
    return out


def repair_stream_from_files(spark: SparkSession, in_dir: str) -> DataFrame:
    lines = spark.readStream.format("text").load(in_dir).withColumnRenamed("value", "text")
    return repair_stream(lines)


def repair_metrics_stream(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed repair-rate metrics with late-data handling.

    The repair itself needs no state (rows independent, reference
    parity); the *metrics* side-output is the one genuinely stateful
    streaming piece: tumbling event-time windows of repair outcomes
    with a watermark bounding state (docs arriving later than
    ``watermark`` are dropped from their window).

    ``events`` must be a streaming frame with ``ts: timestamp`` and
    ``text: string``.  Append mode downstream emits a window only once
    its watermark passes — bounded state on a 10^12-doc firehose.
    """
    r = make_repair_udf()(F.col("text"))
    return (
        events.withWatermark("ts", watermark)
        .withColumn("ok", r["ok"] & (r["repaired"] != F.lit('""')))
        .groupBy(F.window("ts", window), F.col("ok"))
        .agg(F.count("*").alias("docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "ok",
            "docs",
        )
    )


def run_once(spark: SparkSession, in_dir: str, out_dir: str, checkpoint_dir: str) -> None:
    """Drain all available input once (test/batch-catchup mode)."""
    q = (
        repair_stream_from_files(spark, in_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def stream_quality_filter(pages: DataFrame) -> DataFrame:
    """The FULL quality-filter DAG on a streaming web-page frame.

    The batch pipeline (operators/pipeline.py:quality_filter) is
    map-only until its metrics aggregation, so the same column stages
    lift onto Structured Streaming unchanged — langid, the fused
    repair+perplexity Arrow hop, heuristics, scrub, and keep fusion
    all run per micro-batch with no state.  ``pages`` needs the
    web-page columns (url, text, lang, ...); output mode: append.
    """
    from ..operators.pipeline import quality_filter

    return quality_filter(pages, with_actions=False)


def run_quality_filter_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str | None = None,
) -> None:
    """Drain a parquet directory of web pages through the streaming
    quality filter exactly once (availableNow) — same code path as a
    continuous run; exactly-once via the sink checkpoint.

    ``schema`` defaults to the canonical web-page shape (north_rule
    input_hint; sources/webpages.CORPUS_SCHEMA plus any extra columns
    the writer added are NOT inferred) — pass an explicit DDL string
    for other layouts.  No batch pre-read of the input directory
    happens either way (a second full-directory listing per trigger at
    production scale, VERDICT r2 #8)."""
    from ..sources.webpages import CORPUS_SCHEMA

    pages = spark.readStream.schema(schema or CORPUS_SCHEMA).parquet(in_dir)
    out = stream_quality_filter(pages).select(
        "url", "lang_id", "ok", "fast_path", "n_repairs", "keep", "repaired", "scrubbed"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
