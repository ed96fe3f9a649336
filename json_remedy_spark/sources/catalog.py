"""Table IO — Iceberg when a catalog is configured, parquet otherwise.

Production (north_rule) targets Iceberg tables partitioned by
``bucket(url)`` / ``days(warc_ts)`` so Catalyst prunes partitions and
commits are snapshot-atomic.  The sandbox has no Iceberg runtime jar,
so the same call sites fall back to parquet directories with
identical dataframe semantics; the checkpoint manifest
(operators/checkpoint.py) supplies the atomic-commit half.

Enable the Iceberg path by configuration alone:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<v> \\
      --conf spark.sql.catalog.jrs=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.jrs.type=hadoop \\
      --conf spark.sql.catalog.jrs.warehouse=<path> job.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """``catalog.db.table`` (Iceberg) or a parquet path."""
    if "/" not in ref and iceberg_available(spark):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    spark = df.sparkSession
    if "/" not in ref and iceberg_available(spark):
        if mode == "append":
            df.writeTo(ref).append()
        else:
            df.writeTo(ref).createOrReplace()
        return
    df.write.mode("overwrite" if mode != "append" else "append").parquet(ref)


def write_bucketed_table(
    df: DataFrame,
    identifier: str,
    out_dir: str,
    n_buckets: int = 8,
    key: str = "url",
) -> str:
    """Write ``df`` as a bucket-partitioned table.

    With an Iceberg catalog configured: ``writeTo(identifier)`` with a
    bucket partition transform (atomic snapshot commit).  Without one:
    the checkpoint module's parquet + manifest layout under
    ``out_dir`` (atomic manifest rename per bucket).  Returns the
    format actually used ("iceberg" | "parquet+manifest")."""
    spark = df.sparkSession
    if iceberg_available(spark):
        from pyspark.sql.functions import bucket, col

        (
            df.writeTo(identifier)
            .partitionedBy(bucket(n_buckets, col(key)))
            .using("iceberg")
            .createOrReplace()
        )
        return "iceberg"
    from json_remedy_spark.operators.checkpoint import run_with_checkpoints

    run_with_checkpoints(lambda part: part, df, out_dir, n_buckets=n_buckets, key=key)
    return "parquet+manifest"
