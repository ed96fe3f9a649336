"""Streaming sessionization: Spark's native ``session_window`` +
watermark over an event stream — the streaming twin of the batch
``functions/events.py:sessionize`` (same gap semantics; the batch
operator is the oracle-checked reference, this is the incremental
form late events and restarts flow through).

Shape: ``readStream -> withWatermark -> groupBy(session_window(ts,
gap), user) -> agg`` in append mode — sessions finalize when the
watermark passes their close, which is exactly the correctness
contract for gap windows under late data.  State is bounded by open
sessions per user; the watermark evicts closed ones (no TTL timers —
this avoids the applyInPandasWithState/availableNow hang documented
in CLAUDE.md by using the built-in stateful operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_remedy_spark.functions.events import SESSION_GAP_MINUTES

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long"


def session_stream(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    watermark: str = "1 hour",
) -> DataFrame:
    """Append-mode session aggregation over a (possibly late) event
    stream: one row per finalized session with the same rollup columns
    as the batch operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), f"{int(gap_minutes)} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def run_once(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> None:
    """Drain the input directory with trigger=availableNow — identical
    code path to a continuous run; restarts resume from the
    checkpointed state."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA).format("parquet").load(in_dir)
    )
    q = (
        session_stream(events, gap_minutes)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
