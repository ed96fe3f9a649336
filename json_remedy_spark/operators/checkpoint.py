"""Per-partition checkpoint manifest: a killed run resumes without
recompute (north_rule).

Protocol (Iceberg-snapshot-like, but plain parquet + manifest):

1. The corpus is bucketed into ``n_buckets`` deterministic partitions
   by ``xxhash64(url)`` — stable across cluster sizes.
2. Each committed bucket writes ``part_bucket=<b>`` parquet plus a row
   in the manifest table.
3. Resume = anti-join the bucket list against committed manifest rows;
   only missing buckets recompute.

Writes are idempotent: a bucket directory is rewritten atomically
(overwrite by partition) and the manifest append is the commit point.
"""

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST = "_manifest"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "url") -> DataFrame:
    return df.withColumn("part_bucket", (F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))).cast("int"))


def committed_buckets(out_dir: str) -> set:
    path = os.path.join(out_dir, MANIFEST)
    done = set()
    if os.path.isdir(path):
        for f in os.listdir(path):
            if f.endswith(".json"):
                with open(os.path.join(path, f)) as fh:
                    done.add(json.load(fh)["bucket"])
    return done


def _commit(out_dir: str, bucket: int, n_rows: int) -> None:
    path = os.path.join(out_dir, MANIFEST)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".bucket-{bucket}.tmp")
    final = os.path.join(path, f"bucket-{bucket}.json")
    with open(tmp, "w") as fh:
        json.dump({"bucket": bucket, "rows": n_rows, "ts": time.time()}, fh)
    os.replace(tmp, final)  # atomic commit point


def run_with_checkpoints(
    pipeline_fn,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    key: str = "url",
) -> list:
    """Run ``pipeline_fn(bucket_df)`` per uncommitted bucket, writing
    results + manifest.  Returns list of buckets computed this run.

    ``key`` is the bucketing column (must match across resume runs —
    the manifest records bucket ids, not the key, so changing it
    between runs of the same ``out_dir`` would mis-assign rows)."""
    docs_b = with_bucket(docs, n_buckets, key=key).cache()
    done = committed_buckets(out_dir)
    computed = []
    for b in range(n_buckets):
        if b in done:
            continue
        part = docs_b.where(F.col("part_bucket") == b)
        result = pipeline_fn(part)
        path = os.path.join(out_dir, f"part_bucket={b}")
        result.drop("part_bucket").write.mode("overwrite").parquet(path)
        # manifest row count comes from the COMMITTED files (parquet
        # footer metadata — no data read), never result.count(), which
        # would re-execute the whole bucket pipeline a second time
        n = docs_b.sparkSession.read.parquet(path).count()
        _commit(out_dir, b, n)
        computed.append(b)
    docs_b.unpersist()
    return computed
