"""spark-submit child for tools/job_scaling_rehearsal.py.

Launched as:

    spark-submit --master local[N] --py-files dist/json_remedy_spark.zip \
        tools/_job_scaling_child.py <input_parquet> <out_dir> <n_buckets>

Deliberately does NOT put the repo root on sys.path: the package
import must resolve from the --py-files zip, so every drill run also
re-validates the production launch artifact (north_rule: "run via
spark-submit --py-files").  Prints one JSON line with the measured
compute throughput of the checkpointed quality-filter job (session
startup excluded — the parent reports end-to-end wall separately).
"""

import json
import sys
import time


def main() -> None:
    inp, out, buckets = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("json_remedy_spark.job_scaling")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )

    from json_remedy_spark.operators.checkpoint import run_with_checkpoints
    from json_remedy_spark.operators.pipeline import quality_filter

    docs = spark.read.parquet(inp)
    n = docs.count()  # warms the file listing; scan itself re-runs per bucket
    t0 = time.time()
    done = run_with_checkpoints(quality_filter, docs, out, n_buckets=buckets)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "docs": n,
                "sec": round(dt, 1),
                "docs_per_sec": round(n / dt, 1),
                "buckets_committed": len(done),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
