"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the F1-scoring join (outputs vs reference labels on url),
incremental-run anti-joins, and dedup-pair verification all hit the
same keys repeatedly.  Writing both sides bucketed by the join key
lets every such join run exchange-free: Spark matches bucket specs
and skips the shuffle entirely (SortMergeJoin over pre-bucketed
files).  Works with the native (non-Hive) catalog.
"""

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url", how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key, how)
