"""Table IO — Iceberg when a catalog is configured, parquet otherwise.

Production (north_rule) targets Iceberg tables partitioned by
``bucket(url)`` / ``days(warc_ts)`` so Catalyst prunes partitions and
commits are snapshot-atomic.  The sandbox has no Iceberg runtime jar,
so the same call sites fall back to parquet directories with
identical dataframe semantics; the checkpoint manifest
(operators/checkpoint.py) supplies the atomic-commit half.
"""

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
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
