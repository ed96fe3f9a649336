"""Event analytics: gap-based sessionization — the batch twin of
Structured Streaming's ``session_window`` (same semantics as
``F.session_window`` with a static gap, expressed as windows so the
per-session rollup is join-free and the DuckDB oracle is exact).

Scale shape: ONE shuffle on the user key shared by both window
functions and the final rollup (Spark reuses the exchange); all
arithmetic is integer microseconds, so the oracle matches
bit-for-bit.  Hot users are bounded by their own event counts — the
key space is the user id, and AQE skew-split handles celebrity keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user sessions: an event opens a NEW session when it arrives
    more than ``gap_minutes`` after the previous one.  Returns one row
    per session: ``(user_id, session_no, n_events, start_us, end_us,
    duration_us)`` — timestamps as integer epoch-microseconds (exact
    cross-engine; no float time arithmetic).  ``session_no`` is
    1-based in event order; ties on the timestamp break on the event
    id, so the segmentation is deterministic under any row order."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    # timestampdiff over TIMESTAMP_NTZ is pure wall-clock arithmetic —
    # no session-timezone shift (unix_micros rejects NTZ, and an
    # ltz cast would move the epoch by the host's zone offset while
    # DuckDB's epoch_us treats the same wall clock as UTC)
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).alias("us"),
    )
    marked = e.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_no", F.sum("new_s").over(w))
    return marked.groupBy("user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


def sessionize_sql(gap_minutes: int = SESSION_GAP_MINUTES, table: str = "events") -> str:
    """DuckDB oracle computing exactly ``sessionize``."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM {table}),
      m AS (
        SELECT user_id, event_id, us,
               CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      ),
      s AS (
        SELECT user_id, us,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS session_no
        FROM m
      )
      SELECT user_id::BIGINT AS user_id, session_no::BIGINT AS session_no,
             count(*)::BIGINT AS n_events,
             min(us)::BIGINT AS start_us, max(us)::BIGINT AS end_us,
             (max(us) - min(us))::BIGINT AS duration_us
      FROM s GROUP BY user_id, session_no
    """
