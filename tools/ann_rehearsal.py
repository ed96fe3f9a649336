"""ANN scale rehearsal: the at-rest IVF index a decade apart.

Completes the round-5 rehearsal triptych (corpus job, dedup job,
similarity path): build the partition-pruned IVF index
(``write_ivf_index``) at 200k and 2M vectors over the same
deterministic clustered corpus (``sources/vectors.py``), query both
with the same 100 held-out vectors, and score IVF recall@10 against
the exact brute-force ``cosine_topk`` truth.

What the two decades must show for the 100 TB design to hold:
  - index build scales ~linearly (one centroid pass + one cell
    assignment map + one repartitioned write),
  - query latency scales with the PROBED FRACTION of the corpus, not
    the corpus (probes/cells is held constant across sizes, so the
    probed row count grows 10x but the scan skips the other ~94% of
    partitions at both sizes),
  - recall@10 stays flat (cells grow as sqrt(N), so per-cell
    population grows sqrt(N) too — probing the same fraction keeps
    the same neighborhoods).

Usage:
  PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
      python tools/ann_rehearsal.py [--small 200000] [--big 2000000] [--md]
"""

import argparse
import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TMP = "/tmp/jrs_ann"
N_QUERIES = 100
K = 10
DIMS = 64
LABELS = 64
PROBE_FRACTION = 16  # probes = cells // PROBE_FRACTION


def get_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-rehearsal")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_vectors(spark, n: int) -> tuple:
    """Corpus = vec_id < n, queries = the next N_QUERIES ids of the
    SAME distribution (same seed -> same centers; disjoint ids)."""
    path = os.path.join(TMP, f"vectors_{n}")
    qpath = os.path.join(TMP, f"queries_{n}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from json_remedy_spark.sources.vectors import synthesize_vectors

        all_v = synthesize_vectors(
            spark, n + N_QUERIES, dims=DIMS, n_labels=LABELS, partitions=max(32, n // 50_000)
        )
        all_v.where(f"vec_id < {n}").write.mode("overwrite").parquet(path)
        all_v.where(f"vec_id >= {n}").selectExpr(
            "vec_id AS q_id", "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(qpath)
    return path, qpath


def run_size(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.similarity import (
        cosine_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )

    vpath, qpath = ensure_vectors(spark, n)
    vectors = spark.read.parquet(vpath)
    queries = spark.read.parquet(qpath)
    cells = int(math.sqrt(n))
    probes = max(4, cells // PROBE_FRACTION)
    idx = os.path.join(TMP, f"ivf_{n}")
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.time()
    n_cells = write_ivf_index(vectors, idx, cells=cells, refine=1)
    t_build = round(time.time() - t0, 1)

    t0 = time.time()
    got = ivf_topk_from_index(spark, idx, queries, k=K, probes=probes)
    ivf_rows = {(r["q_id"], r["vec_id"]) for r in got.collect()}
    t_query = round(time.time() - t0, 1)

    t0 = time.time()
    truth = cosine_topk(vectors, queries, k=K, id_col="vec_id")
    truth_rows = {(r["q_id"], r["vec_id"]) for r in truth.collect()}
    t_brute = round(time.time() - t0, 1)

    recall = round(len(ivf_rows & truth_rows) / len(truth_rows), 4)
    files = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(os.path.join(idx, "vectors"))
    )
    return {
        "n": n,
        "cells": n_cells,
        "probes": probes,
        "index_files": files,
        "build_sec": t_build,
        "ivf_query_sec": t_query,
        "brute_force_sec": t_brute,
        "recall_at_10": recall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=200_000)
    ap.add_argument("--big", type=int, default=2_000_000)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()
    os.makedirs(TMP, exist_ok=True)
    spark = get_spark()

    out = {}
    for n in (args.small, args.big):
        out[str(n)] = run_size(spark, n)
        print(json.dumps(out[str(n)]), flush=True)

    s, b = out[str(args.small)], out[str(args.big)]
    ratio = args.big / args.small
    summary = {
        "input_ratio": ratio,
        "build_ratio": round(b["build_sec"] / s["build_sec"], 2),
        "query_ratio": round(b["ivf_query_sec"] / s["ivf_query_sec"], 2),
        "brute_ratio": round(b["brute_force_sec"] / s["brute_force_sec"], 2),
        "recall_small": s["recall_at_10"],
        "recall_big": b["recall_at_10"],
    }
    print(json.dumps(summary), flush=True)
    if args.md:
        print(
            f"| n | cells | probes | files | build s | ivf query s | brute s | recall@10 |\n"
            f"|---|---|---|---|---|---|---|---|\n"
            f"| {s['n']} | {s['cells']} | {s['probes']} | {s['index_files']} | "
            f"{s['build_sec']} | {s['ivf_query_sec']} | {s['brute_force_sec']} | {s['recall_at_10']} |\n"
            f"| {b['n']} | {b['cells']} | {b['probes']} | {b['index_files']} | "
            f"{b['build_sec']} | {b['ivf_query_sec']} | {b['brute_force_sec']} | {b['recall_at_10']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
