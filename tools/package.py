"""Build the --py-files artifact and print the spark-submit line.

Usage: python tools/package.py [dist_dir]

A multi-executor launch (north_rule) ships the package as one zip:

  spark-submit \
    --master spark://<host>:7077 \
    --py-files dist/json_remedy_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    jobs/run_quality_filter.py --input <iceberg-or-parquet> --output <dir>
"""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dist_dir: str) -> str:
    os.makedirs(dist_dir, exist_ok=True)
    out = os.path.join(dist_dir, "json_remedy_spark.zip")
    pkg = os.path.join(ROOT, "json_remedy_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    dist = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist")
    path = build(dist)
    print(path)
