"""Custom stateful streaming operator: exact dedup over a document
stream via ``applyInPandasWithState``.

Keeps ONE deterministic representative per normalized-text hash (the
lexicographically smallest raw text in the group's first micro-batch;
rows shuffle in arbitrary order, so "first seen row" would be
nondeterministic) and drops all later duplicates — across
micro-batches and across restarts (state lives in the checkpoint).  This is the one place the engine needs
user-defined streaming state; everything else is stateless (reference
parity) or a built-in watermarked window.

Scale notes: state is one boolean per distinct hash, partitioned by
the hash key (Spark shuffles each key to a stable state partition);
at 10^12 docs pair this with a TTL (GroupStateTimeout) or an upstream
bloom pre-filter so state stays bounded.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("text_hash", StringType()),
        StructField("text", StringType()),
        StructField("n_dropped_in_batch", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(key, pdfs, state):
    import pandas as pd

    (text_hash,) = key
    seen = state.get[0] if state.exists else 0
    # rows arrive in arbitrary shuffle order within the micro-batch;
    # the representative is the lexicographically smallest raw text in
    # the group's FIRST batch so the output is deterministic even when
    # raw texts differ under one normalized hash (ADVICE r1)
    rep_text = None
    n = 0
    for pdf in pdfs:
        n += int(pdf["text"].notna().sum())
        batch_min = pdf["text"].dropna().min() if len(pdf) else None
        if batch_min is not None and (rep_text is None or batch_min < rep_text):
            rep_text = batch_min
    emit = seen == 0
    state.update((seen + n,))
    if emit and rep_text is not None:
        yield pd.DataFrame(
            {
                "text_hash": [text_hash],
                "text": [rep_text],
                # drops within the EMITTING batch only; cumulative
                # drops live in the state counter (seen - 1)
                "n_dropped_in_batch": [n - 1],
            }
        )


def stream_exact_dedup(lines: DataFrame) -> DataFrame:
    """``text`` stream -> first-occurrence stream (stateful)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = lines.withColumn(
        "text_hash", F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_once(spark, in_dir: str, out_dir: str, checkpoint_dir: str) -> None:
    lines = spark.readStream.format("text").load(in_dir).withColumnRenamed("value", "text")
    q = (
        stream_exact_dedup(lines)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
