"""Input readers — reference ``from_file/2`` (lib/json_remedy.ex:182)
and bulk text ingestion re-expressed as Spark scans."""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def from_file(spark: SparkSession, path: str) -> DataFrame:
    """One whole file -> one row -> repaired (from_file parity)."""
    from ..operators.repair_udf import make_repair_udf

    df = spark.read.text(path, wholetext=True).withColumnRenamed("value", "text")
    r = make_repair_udf()(F.col("text"))
    return df.select(
        F.lit(path).alias("path"),
        r["repaired"].alias("repaired"),
        r["ok"].alias("ok"),
        r["n_repairs"].alias("n_repairs"),
    )


def from_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-document corpus (repair_stream batch shape)."""
    from ..operators.repair_udf import make_repair_udf

    df = spark.read.text(path).withColumnRenamed("value", "text")
    r = make_repair_udf()(F.col("text"))
    return df.select("text", r["repaired"].alias("repaired"), r["ok"].alias("ok")).where(
        F.col("ok") & (F.col("repaired") != F.lit('""'))
    )
