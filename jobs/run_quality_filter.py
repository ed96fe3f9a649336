"""Production entry point — spark-submit --py-files launcher.

  spark-submit --py-files dist/json_remedy_spark.zip \
      jobs/run_quality_filter.py \
      --input  <iceberg table | parquet dir> \
      --output <iceberg table | parquet dir> \
      --metrics-output <dir> --buckets 256 [--resume]

Checkpointed: each url-hash bucket commits independently; a killed run
restarted with --resume recomputes only uncommitted buckets
(operators/checkpoint.py).  Metrics/lineage tables (repair-rule
frequencies, layer hits, langid/ppl histograms) are written per run.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics-output", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from json_remedy_spark.operators.checkpoint import run_with_checkpoints
    from json_remedy_spark.operators.metrics import (
        langid_histogram,
        layer_hit_counts,
        perplexity_histogram,
        repair_action_frequencies,
    )
    from json_remedy_spark.operators.pipeline import quality_filter
    from json_remedy_spark.sources.catalog import read_table

    spark = (
        SparkSession.builder.appName("json_remedy_spark.quality_filter")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )

    docs = read_table(spark, args.input)
    if not args.resume and os.path.isdir(os.path.join(args.output, "_manifest")):
        raise SystemExit(f"{args.output} has a manifest; pass --resume to continue it")

    computed = run_with_checkpoints(quality_filter, docs, args.output, n_buckets=args.buckets)
    print(f"committed {len(computed)} new buckets -> {args.output}")

    if args.metrics_output:
        result = spark.read.parquet(os.path.join(args.output, "part_bucket=*"))
        for name, df in {
            "repair_actions": repair_action_frequencies(result),
            "layer_hits": layer_hit_counts(result),
            "langid_hist": langid_histogram(result),
            "ppl_hist": perplexity_histogram(result),
        }.items():
            df.write.mode("overwrite").parquet(os.path.join(args.metrics_output, name))
        print(f"metrics -> {args.metrics_output}")

    spark.stop()


if __name__ == "__main__":
    main()
