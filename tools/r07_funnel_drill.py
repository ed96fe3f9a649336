"""Per-stage drill for corpus_funnel (guide §1): replicate the query's
exact stage chain and time each stage's materialization (count on the
persisted frame, mirroring what the final cross-joined agg forces).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from bench import make_spark
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from json_remedy_spark.functions import dedup, webgraph
    from json_remedy_spark.functions.corpus import (
        canonical_url,
        decontaminate,
        line_dedup,
    )

    spark = make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), "r07-funnel-drill")
    spark.sparkContext.setLogLevel("ERROR")
    F_ = F

    def consume(df):
        df.agg(F.sum(F.length(F.to_json(F.struct("*")))).alias("c")).collect()

    consume(spark.range(1000).withColumn("x", F.col("id") * 2).repartition(8))

    for rep in range(2):
        print(f"== rep {rep} ==", flush=True)
        t0 = time.time()
        last = [t0]

        def lap(name):
            now = time.time()
            print(f"  {name:40s} {now - last[0]:7.3f}s", flush=True)
            last[0] = now

        d_all = entry._t(spark, SF_DIR, "documents")
        ev = d_all.where(F.col("source") == "src0").select("doc_id", "text")
        corp = d_all.where(F.col("source") != "src0")

        g = F.expr("doc_id DIV 3")
        h = F.pmod(g, 10).cast("string")
        gs = g.cast("string")
        path = (
            F.when(F.pmod(g, 4) == 0, F.concat(F.lit("/admin/panel"), gs))
            .when(F.pmod(g, 4) == 1, F.concat(F.lit("/products/"), gs))
            .when(F.pmod(g, 4) == 2, F.concat(F.lit("/tmp/cache/"), gs))
            .otherwise(F.concat(F.lit("/p/"), gs))
        )
        variant = F.pmod(F.col("doc_id"), 3)
        port = F.when(F.pmod(g, 7) == 0, F.lit(":8080")).otherwise(F.lit(""))
        url = (
            F.when(variant == 0, F.concat(F.lit("HTTP://Shop"), h, F.lit(".Example.COM"), port, path))
            .when(variant == 1, F.concat(F.lit("http://shop"), h, F.lit(".example.com"), port, path, F.lit("?utm_source=feed")))
            .otherwise(F.concat(F.lit("http://shop"), h, F.lit(".example.com"), port, path, F.lit("#top")))
        )
        text = F.concat(
            F.lit("Please enable cookies to continue\n"),
            F.lit("section "), h, F.lit(" navigation menu\n"),
            F.substring(F.col("text"), 1, 80),
            F.lit(" marker "), F.pmod(F.col("doc_id"), 97).cast("string"),
            F.lit("\ncopyright footer "), variant.cast("string"),
        )
        dp = spark.sparkContext.defaultParallelism
        pages = corp.select(
            F.col("doc_id").cast("long").alias("doc_id"), url.alias("url"), text.alias("text")
        ).repartition(dp).persist()
        n_in = pages.count()
        lap(f"pages materialize ({n_in})")

        s0 = (
            webgraph.url_quality_gate(pages)
            .where(F.col("url_ok"))
            .select("doc_id", "url", "text")
            .persist()
        )
        n0 = s0.count()
        lap(f"s0 url gate ({n0})")

        n_tbl = entry._t(spark, SF_DIR, "nation")
        n = F.col("n_nationkey")
        body = F.concat(
            F.lit("User-agent: megabot\nDisallow: /products\n"),
            F.when(
                n % 3 == 0,
                F.lit(
                    "User-agent: helper\nUser-agent: *\n"
                    "DISALLOW: /admin # panel is private\nDisallow: /tmp/\nDisallow:\n"
                ),
            )
            .when(n % 3 == 1, F.lit("User-agent: *\n# nothing blocked\nDisallow:\n"))
            .otherwise(F.lit("")),
        )
        robots = n_tbl.where(n < 10).select(
            F.concat(F.lit("shop"), n.cast("string"), F.lit(".example.com")).alias("host"),
            body.alias("robots_txt"),
        )
        rules = webgraph.robots_disallow_rules(robots)
        s1 = (
            webgraph.robots_filter(s0, rules)
            .where(~F.col("robots_disallowed"))
            .select("doc_id", "url", "text")
            .persist()
        )
        n1 = s1.count()
        lap(f"s1 robots ({n1})")

        keyed = s1.withColumn("canon_url", canonical_url(F.col("url")))
        rep_ = keyed.groupBy("canon_url").agg(F.min("url").alias("rep_url"))
        s2 = (
            keyed.join(rep_, "canon_url")
            .where(F.col("url") == F.col("rep_url"))
            .select("doc_id", "text")
            .persist()
        )
        n2 = s2.count()
        lap(f"s2 url dedup ({n2})")

        s3 = (
            line_dedup(s2)
            .where(F.length(F.trim("text")) > 0)
            .select("doc_id", "text")
            .repartition(dp)
            .persist()
        )
        n3 = s3.count()
        lap(f"s3 line dedup ({n3})")

        comp = dedup.near_dup_components(s3, threshold=0.5)
        s4 = s3.join(
            comp.where(F.col("is_canonical")).select("doc_id"), "doc_id"
        ).repartition(dp).persist()
        n4 = s4.count()
        lap(f"s4 fuzzy components ({n4})")

        s5 = decontaminate(s4, ev).where(~F.col("contaminated")).select("doc_id")
        n5 = s5.count()
        lap(f"s5 decontaminate ({n5})")

        out = (
            pages.agg(F.count("*").cast("long").alias("n_input"))
            .crossJoin(s0.agg(F.count("*").cast("long").alias("a")))
            .crossJoin(s1.agg(F.count("*").cast("long").alias("b")))
            .crossJoin(s2.agg(F.count("*").cast("long").alias("c")))
            .crossJoin(s3.agg(F.count("*").cast("long").alias("d")))
            .crossJoin(s4.agg(F.count("*").cast("long").alias("e")))
            .crossJoin(s5.agg(F.count("*").cast("long").alias("f")))
        )
        consume(out)
        lap("final crossjoin counts + consume")
        print(f"  TOTAL {time.time() - t0:7.3f}s", flush=True)
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
