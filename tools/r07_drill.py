"""Round-7 per-phase drill: break the expensive suite queries into
their sub-steps and time each (guide §1 — find where the time goes
before changing anything).  Sections selected by argv.

Usage: python tools/r07_drill.py [ivf_pq|funnel|incr|bm25|components|bpe] ...
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.t0 = time.time()
        self.last = self.t0

    def lap(self, name):
        now = time.time()
        print(f"  {name:45s} {now - self.last:7.3f}s", flush=True)
        self.last = now

    def total(self, name="TOTAL"):
        print(f"  {name:45s} {time.time() - self.t0:7.3f}s", flush=True)


def main():
    sections = sys.argv[1:] or ["ivf_pq"]
    from bench import make_spark
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "r07-drill")
    spark.sparkContext.setLogLevel("ERROR")

    def consume(df):
        df.agg(F.sum(F.length(F.to_json(F.struct("*")))).alias("consumed")).collect()

    consume(spark.range(1000).withColumn("x", F.col("id") * 2).repartition(8))

    if "ivf_pq" in sections:
        import shutil
        import tempfile

        from json_remedy_spark.localdf import local_frame
        from json_remedy_spark.functions.similarity import (
            _ivf_centroids,
            _write_assigned_cells,
            ivf_topk_from_index,
            train_pq_codebooks,
        )
        import numpy as np

        print("== ivf_pq_topk phases ==")
        for rep in range(2):
            t = T()
            e = entry._t(spark, SF_DIR, "embeddings").withColumn(
                "embedding", F.col("embedding").cast("array<double>")
            )
            idx = os.path.join(tempfile.gettempdir(), "jrs_drill_pq_index")
            shutil.rmtree(idx, ignore_errors=True)
            src = e.select("vec_id", "embedding")
            cen = _ivf_centroids(src, "embedding", 8, refine=1)
            t.lap("centroids (seed + 1 refine)")
            local_frame(
                spark,
                [(i, [float(x) for x in cen[i]]) for i in range(len(cen))],
                "cell int, centroid array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(os.path.join(idx, "centroids"))
            t.lap("centroids write")
            books = train_pq_codebooks(src, col="embedding")
            t.lap("train_pq_codebooks")
            m, ksub, dsub = books.shape
            local_frame(
                spark,
                [
                    (s, c, p, int(books[s, c, p]))
                    for s in range(m)
                    for c in range(ksub)
                    for p in range(dsub)
                ],
                "sub int, code int, pos int, val long",
            ).coalesce(1).write.mode("overwrite").parquet(os.path.join(idx, "codebooks"))
            t.lap("codebooks write")
            _write_assigned_cells(src, cen, "embedding", idx, "overwrite", quantize="pq", books=books)
            t.lap("assign+encode+partitioned write")
            queries = e.where(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            out = ivf_topk_from_index(spark, idx, queries, k=5, probes=8)
            out = out.persist()
            out.select("q_id", "vec_id").write.mode("overwrite").parquet(
                os.path.join(tempfile.gettempdir(), "jrs_drill_pq_export")
            )
            t.lap("query + export write")
            consume(out)
            t.lap("consume")
            t.total()
            spark.catalog.clearCache()

    if "components" in sections:
        from json_remedy_spark.functions import dedup

        print("== dedup_components phases ==")
        for rep in range(2):
            t = T()
            d = entry._t(spark, SF_DIR, "documents").repartition(
                spark.sparkContext.defaultParallelism
            )
            handles = []
            pairs = dedup.lsh_verified_pairs(d, 0.5, handles=handles)
            pairs = pairs.persist()
            n = pairs.count()
            t.lap(f"lsh_verified_pairs materialize ({n} pairs)")
            comp = dedup.components_from_pairs(
                d.select("doc_id"), pairs
            )
            consume(comp)
            t.lap("components_from_pairs + consume")
            t.total()
            spark.catalog.clearCache()

    if "bm25" in sections:
        import shutil
        import tempfile

        from json_remedy_spark.functions.search import (
            bm25_topk_from_postings,
            write_postings_table,
        )

        print("== bm25_index_topk phases ==")
        for rep in range(2):
            t = T()
            d = entry._t(spark, SF_DIR, "documents")
            idx = os.path.join(tempfile.gettempdir(), "jrs_drill_bm25")
            shutil.rmtree(idx, ignore_errors=True)
            write_postings_table(d, idx, n_buckets=16, max_df_frac=1.0)
            t.lap("write_postings_table")
            queries = spark.createDataFrame(entry.BM25_QUERIES, "q_id long, query string")
            out = bm25_topk_from_postings(spark, idx, queries, k=10, n_buckets=16)
            consume(out)
            t.lap("query + consume")
            t.total()
            spark.catalog.clearCache()

    if "funnel" in sections:
        print("== corpus_funnel (whole, for reference) ==")
        for rep in range(2):
            t = T()
            consume(entry.q_corpus_funnel(spark, SF_DIR))
            t.total()
            spark.catalog.clearCache()

    if "incr" in sections:
        from json_remedy_spark.functions import dedup

        print("== incremental_fuzzy_dedup phases ==")
        for rep in range(2):
            t = T()
            d = entry._t(spark, SF_DIR, "documents").repartition(
                spark.sparkContext.defaultParallelism
            )
            seen = d.where("doc_id % 3 <> 0")
            new = d.where("doc_id % 3 = 0")
            seen_banded = dedup.banded_signatures(dedup.minhash_signatures(seen))
            seen_comp = dedup.near_dup_components(seen, threshold=0.5)
            seen_comp = seen_comp.persist()
            seen_comp.count()
            t.lap("seen near_dup_components")
            out = dedup.incremental_near_dup_components(
                new, seen_banded, seen, seen_comp, threshold=0.5
            )
            consume(out)
            t.lap("incremental components + consume")
            t.total()
            spark.catalog.clearCache()

    if "bpe" in sections:
        from json_remedy_spark.functions.bpe import (
            bpe_encode_bytes,
            bpe_learn_bytes,
            byte_vocab,
        )
        from json_remedy_spark.functions.corpus import pack_token_ids

        print("== pack_byte_token_ids phases ==")
        for rep in range(2):
            t = T()
            d = entry._t(spark, SF_DIR, "documents")
            merges = bpe_learn_bytes(d, entry.BYTE_BPE_N_MERGES)
            t.lap("bpe_learn_bytes")
            enc = bpe_encode_bytes(d, merges, byte_vocab(merges))
            enc.write.format("noop").mode("overwrite").save()
            t.lap("bpe_encode_bytes (noop)")
            out = pack_token_ids(enc, 256)
            consume(out)
            t.lap("pack_token_ids + consume (incl re-encode)")
            t.total()
            spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
