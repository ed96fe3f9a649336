"""Benchmark harness — one JSON line to stdout.

Headline: the full quality-filter pipeline (synthetic web-page corpus
sized to the sf dir) plus the driver-table operator queries.  Also
runs the pipeline at two parallelism levels (local[8] vs local[32])
on the same input to evidence the north_rule scaling criterion —
efficiency = (T8/T32)/4 capped... reported as docs/sec at both.

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  BENCH_SCALING=0      skip the second (local[8]) run for quick loops
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("BENCH_SCALING", "1") != "0"

# corpus size scales with the sf dir (lineitem rows ~ 6M * sf)
_SF_GUESS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
N_DOCS = _SF_GUESS.get(os.path.basename(SF_DIR.rstrip("/")), 20_000)


def make_spark(cores: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


_CORPUS_CACHE: dict[int, str] = {}


def corpus_parquet(spark, n_docs: int) -> str:
    """Materialize the synthetic corpus once per size; the measured job
    then reads parquet like a production run (scan parallelism from
    files.maxPartitionBytes, not from the generator)."""
    import tempfile

    from json_remedy_spark.sources.webpages import synthesize_corpus

    if n_docs not in _CORPUS_CACHE:
        path = os.path.join(tempfile.gettempdir(), f"jrs_bench_corpus_{n_docs}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs, _ = synthesize_corpus(spark, n_docs, partitions=160)
            docs.write.mode("overwrite").parquet(path)
        _CORPUS_CACHE[n_docs] = path
    return _CORPUS_CACHE[n_docs]


def run_pipeline(spark, n_docs: int, partitions: int = 0) -> tuple[float, int]:
    """Full DAG over the materialized corpus; returns (sec, kept_rows)."""
    from pyspark.sql import functions as F

    from json_remedy_spark.operators.pipeline import quality_filter

    path = corpus_parquet(spark, n_docs)
    docs = spark.read.parquet(path)
    t0 = time.time()
    out = quality_filter(docs, with_actions=False)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("int")).alias("kept"),
        F.sum(F.length("scrubbed")).alias("bytes_out"),
    ).collect()[0]
    dt = time.time() - t0
    assert agg["n"] == n_docs
    return dt, agg["kept"]


def run_query_suite(spark) -> dict:
    import __spark_entry__ as entry

    timings = {}
    for name, fn in entry.queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    return timings


def main():
    results = {}

    spark = make_spark(CPUS, "bench-main")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM/Arrow paths once so the measured run is steady-state;
    # best-of-2 because this host shows heavy CPU-steal variance
    run_pipeline(spark, 2_000)
    t_main, kept = run_pipeline(spark, N_DOCS)
    t2, _ = run_pipeline(spark, N_DOCS)
    t_main = min(t_main, t2)
    queries = run_query_suite(spark)
    spark.stop()

    docs_per_sec_main = N_DOCS / t_main
    results = {
        "metric": "quality_filter docs/sec + operator suite",
        "value": round(t_main, 3),
        "unit": "sec",
        "sf": SF_DIR,
        "n_docs": N_DOCS,
        "kept": int(kept),
        "docs_per_sec": round(docs_per_sec_main, 1),
        "queries": {"pipeline": round(t_main, 3), **queries},
    }

    if RUN_SCALING:
        # same input, two parallelism levels (no real cluster in sandbox;
        # north_rule scaling evidenced as local[8] vs local[32])
        scal = {}
        for cores in (8, 32):
            s = make_spark(cores, f"bench-scale-{cores}")
            s.sparkContext.setLogLevel("ERROR")
            run_pipeline(s, 2_000)  # warmup
            dt, _ = run_pipeline(s, N_DOCS)
            dt2, _ = run_pipeline(s, N_DOCS)
            scal[cores] = N_DOCS / min(dt, dt2)  # best-of-2 vs CPU steal
            s.stop()
        eff = (scal[32] / scal[8]) / 4.0
        results["scaling"] = {
            "docs_per_sec_8": round(scal[8], 1),
            "docs_per_sec_32": round(scal[32], 1),
            "efficiency_8_to_32": round(eff, 3),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
