"""BM25 keyword retrieval over the document corpus.

Reference scope: the reference (nshkrdotcom/json_remedy) is a repair
kernel; retrieval is graft-mandated pipeline tooling — the standard
way a training-data pipeline mines targeted subsets ("find docs about
X for the mixture", query-based decontamination, quality-probe
panels).  Okapi BM25 with the Lucene idf form:

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    score   = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Spark-first plan shape (100 TB notes):
  - tokenization is one JVM pass (lower + regexp split + explode) —
    no Python in the hot path; the postings table is (doc_id, term,
    tf, dl), built with ONE corpus-keyed aggregation;
  - document frequencies are a term-keyed agg whose output is
    vocabulary-sized, never corpus-sized;
  - ``max_df_frac`` drops stopword-grade terms BEFORE the score join
    (df > frac*N) — the skew guard: "the" would otherwise route the
    whole corpus through one join key.  Dropping ubiquitous terms is
    standard BM25 practice (their idf ~ 0 contribution anyway);
  - the query set is tiny and BROADCASTS to the postings; candidate
    docs = postings hitting any query term, so the final top-k window
    shuffles candidates only, bounded by |terms hit| x df-cap.
  - at rest, the postings table lands ``partitionBy(term-bucket)``
    like the LSH signature table; this module keeps the in-session
    form (one query population per run) — the write is the same
    recipe as ``write_signature_table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from json_remedy_spark.localdf import local_frame

TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(col):
    """lower -> split on non-alphanumeric -> drop empties (JVM-side)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "query",
    handles: list | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries``: a small (q_id, query) frame — it broadcasts.
    Returns (q_id, doc_id, score, rank); score is rounded to 6
    decimals so the DuckDB oracle's independent recomputation matches
    exactly.  Deterministic tie-break: score desc, doc_id asc.

    The corpus is tokenized ONCE: the (doc_id, term, tf, dl) postings
    frame persists and feeds the stats scalar agg, the df agg and the
    score join from one materialization (without it Catalyst plans
    three separate tokenize+aggregate corpus passes).  Long-lived
    sessions pass ``handles`` to receive the persisted frame for
    unpersist; at 100 TB this is an at-rest postings table bucketed
    by term — the ``write_signature_table`` recipe."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        .persist()
    )
    if handles is not None:
        handles.append(postings)

    # two scalars reach the driver (bounded agg — never corpus rows);
    # N counts token-bearing docs, matching the oracle's stats CTE.
    # dl values are exact integers, so avg is association-independent
    # and matches DuckDB bit-for-bit.
    stats = (
        postings.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    )
    n_docs, avgdl = stats["n"], stats["avgdl"]

    df_tbl = postings.groupBy("term").agg(F.count("*").alias("df")).where(
        F.col("df") <= F.lit(float(max_df_frac)) * F.lit(float(n_docs))
    )

    q_terms = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(F.array_distinct(_tokens(F.col(q_text_col)))).alias("term"),
    )
    # idf on the (broadcast-sized) query-term x df join
    q_scored_terms = F.broadcast(q_terms).join(df_tbl, "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    )

    hits = postings.join(
        F.broadcast(q_scored_terms.select("q_id", "term", "idf")), "term"
    )
    contrib = hits.withColumn(
        "s",
        F.col("idf")
        * (F.col("tf") * (1.0 + float(k1)))
        / (
            F.col("tf")
            + float(k1) * (1.0 - float(b) + float(b) * F.col("dl") / F.lit(float(avgdl)))
        ),
    )
    scored = contrib.groupBy("q_id", "doc_id").agg(
        F.round(F.sum("s"), 6).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def write_postings_table(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    max_df_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Materialize the BM25 index AT REST — the searchable-corpus form
    of ``bm25_topk``'s in-session postings, mirroring the LSH
    signature table and the IVF cell layout: postings land
    ``partitionBy(bucket)`` where ``bucket = xxhash64(term) % n``, so
    a query's terms map to PARTITION PRUNING at the scan (a q-term
    query touches at most q of n buckets).  Corpus stats (N, avgdl)
    and the df table land beside them; df-capped terms are dropped at
    WRITE time so the stopword skew never reaches disk.  Returns the
    bucket-directory count."""
    import os

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        .persist()
    )
    stats = (
        postings.select("doc_id", "dl").distinct()
        .agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("sum_dl"),
        ).first()
    )
    # sum_dl + n_buckets ride along for the streaming-delta path:
    # merged avgdl must be recomputed as sum_dl/n over base+deltas
    # (dl are exact integers, so the sum — and therefore the merged
    # average — is association-independent and equals a one-shot
    # build's avg bit-for-bit), and delta writers need the bucket
    # count the base was hashed with
    spark = docs.sparkSession
    # Arrow-backed local frame (localdf.py): the list form costs ~5 s
    # of Python-worker round-trips per coalesce(1) write at local[32]
    local_frame(
        spark,
        [(
            int(stats["n"]), float(stats["avgdl"]), int(stats["sum_dl"]),
            int(n_buckets), float(max_df_frac),
        )],
        "n long, avgdl double, sum_dl long, n_buckets int, max_df_frac double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    df_tbl = postings.groupBy("term").agg(F.count("*").alias("df")).where(
        F.col("df") <= F.lit(float(max_df_frac)) * F.lit(float(stats["n"]))
    )
    df_tbl.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "df"))

    kept = postings.join(df_tbl.select("term"), "term", "left_semi").withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    kept.repartition(F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(out_dir, "postings"))
    postings.unpersist()
    return sum(
        1
        for d in os.listdir(os.path.join(out_dir, "postings"))
        if d.startswith("bucket=")
    )


def bm25_topk_from_postings(
    spark,
    out_dir: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
    q_id_col: str = "q_id",
    q_text_col: str = "query",
) -> DataFrame:
    """Query the AT-REST postings table: query terms hash to their
    buckets driver-side (a tiny collect — |distinct query terms|
    values), the postings scan prunes to those bucket partitions, and
    the scoring math is byte-identical to ``bm25_topk`` over the same
    corpus and parameters (pytest-pinned).

    Streamed growth (``stream_postings_ingest``): when
    ``deltas/batch=*`` directories exist they are unioned in — bucket
    stays a partition column inside every delta, so probed-bucket
    pruning applies to base AND delta scans; df counts merge by term
    and corpus stats merge exactly (integer sum_dl), then the df cap
    re-applies against the MERGED corpus size, which is precisely what
    a one-shot build over the union would have done at write time
    (query parity pytest-pinned).  Streamed doc_ids must be new —
    the same disjointness contract as the IVF delta ingest."""
    import os

    srow = spark.read.parquet(os.path.join(out_dir, "stats")).first()
    n_docs, avgdl = srow["n"], srow["avgdl"]
    n_buckets = srow["n_buckets"] if "n_buckets" in srow.__fields__ else n_buckets
    deltas = os.path.join(out_dir, "deltas")
    df_deltas = os.path.join(out_dir, "df_deltas")
    has_deltas = os.path.isdir(deltas)
    max_df_frac = None
    if has_deltas:
        sd = (
            spark.read.option("basePath", os.path.join(out_dir, "stats_deltas"))
            .parquet(os.path.join(out_dir, "stats_deltas"))
            .agg(F.sum("n").alias("n"), F.sum("sum_dl").alias("sum_dl"))
            .first()
        )
        sum_dl = srow["sum_dl"] + int(sd["sum_dl"] or 0)
        n_docs = n_docs + int(sd["n"] or 0)
        avgdl = sum_dl / n_docs  # == a one-shot build's avg (exact ints)
        max_df_frac = srow["max_df_frac"] if "max_df_frac" in srow.__fields__ else 0.5

    q_terms = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(F.array_distinct(_tokens(F.col(q_text_col)))).alias("term"),
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    probed = sorted({r["bucket"] for r in q_terms.select("bucket").distinct().collect()})

    df_tbl = spark.read.parquet(os.path.join(out_dir, "df")).where(
        F.col("bucket").isin(probed)
    )
    if has_deltas:
        ddf = (
            spark.read.option("basePath", df_deltas)
            .parquet(df_deltas)
            .where(F.col("bucket").isin(probed))
            .select("term", "df", "bucket")
        )
        df_tbl = (
            df_tbl.select("term", "df", "bucket")
            .unionByName(ddf)
            .groupBy("term", "bucket")
            .agg(F.sum("df").alias("df"))
            # the write-time stopword cap, re-applied at MERGED scale
            .where(F.col("df") <= F.lit(float(max_df_frac)) * F.lit(float(n_docs)))
        )
    q_idf = F.broadcast(q_terms.select("q_id", "term")).join(df_tbl, "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    )

    postings = spark.read.parquet(os.path.join(out_dir, "postings")).where(
        F.col("bucket").isin(probed)  # -> PartitionFilters at the scan
    )
    if has_deltas:
        dpost = (
            spark.read.option("basePath", deltas)
            .parquet(deltas)
            .where(F.col("bucket").isin(probed))  # pruned in deltas too
            .select("term", "doc_id", "tf", "dl", "bucket")
        )
        postings = postings.select("term", "doc_id", "tf", "dl", "bucket").unionByName(
            dpost
        )
    hits = postings.join(
        F.broadcast(q_idf.select("q_id", "term", "idf")), "term"
    )
    contrib = hits.withColumn(
        "s",
        F.col("idf")
        * (F.col("tf") * (1.0 + float(k1)))
        / (
            F.col("tf")
            + float(k1) * (1.0 - float(b) + float(b) * F.col("dl") / F.lit(float(avgdl)))
        ),
    )
    scored = contrib.groupBy("q_id", "doc_id").agg(
        F.round(F.sum("s"), 6).alias("score")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def compact_postings_deltas(spark, out_dir: str) -> int:
    """Fold streamed delta batches (``stream_postings_ingest``) into
    the base postings layout and drop the delta dirs; queries are
    equal before and after (pytest-pinned).  Unlike the IVF compaction
    this REWRITES the base rather than appending: the df stopword cap
    re-evaluates at the merged corpus size, and a term that crossed
    the cap must have its base postings dropped too — after
    compaction the table is byte-equivalent to a one-shot
    ``write_postings_table`` over the union corpus (modulo the
    monotone-exclusion caveat for terms the base build already
    capped).  The rewrite goes through a versioned temp dir + rename;
    the swap is not atomic — production routes this through a table
    format's transactional REPLACE (Iceberg/Delta), same note as
    ``compact_ivf_deltas``.  Returns the number of batches folded."""
    import glob as _glob
    import os
    import shutil

    delta_root = os.path.join(out_dir, "deltas")
    batches = sorted(_glob.glob(os.path.join(delta_root, "batch=*")))
    if not batches:
        return 0
    srow = spark.read.parquet(os.path.join(out_dir, "stats")).first()
    n_buckets, frac = int(srow["n_buckets"]), float(srow["max_df_frac"])

    sd = (
        spark.read.option("basePath", os.path.join(out_dir, "stats_deltas"))
        .parquet(os.path.join(out_dir, "stats_deltas"))
        .agg(F.sum("n").alias("n"), F.sum("sum_dl").alias("sum_dl"))
        .first()
    )
    n = int(srow["n"]) + int(sd["n"] or 0)
    sum_dl = int(srow["sum_dl"]) + int(sd["sum_dl"] or 0)

    cols = ["term", "doc_id", "tf", "dl", "bucket"]
    merged = (
        spark.read.parquet(os.path.join(out_dir, "postings")).select(*cols)
        .unionByName(
            spark.read.option("basePath", delta_root).parquet(delta_root).select(*cols)
        )
    )
    df_merged = (
        spark.read.parquet(os.path.join(out_dir, "df")).select("term", "df", "bucket")
        .unionByName(
            spark.read.option("basePath", os.path.join(out_dir, "df_deltas"))
            .parquet(os.path.join(out_dir, "df_deltas"))
            .select("term", "df", "bucket")
        )
        .groupBy("term", "bucket")
        .agg(F.sum("df").alias("df"))
        .where(F.col("df") <= F.lit(frac) * F.lit(float(n)))
    )

    tmp_p, tmp_d = os.path.join(out_dir, "postings_v2"), os.path.join(out_dir, "df_v2")
    merged.join(df_merged.select("term"), "term", "left_semi").repartition(
        F.col("bucket")
    ).write.mode("overwrite").partitionBy("bucket").parquet(tmp_p)
    df_merged.select("term", "df", "bucket").write.mode("overwrite").parquet(tmp_d)
    local_frame(
        spark,
        [(n, sum_dl / n, sum_dl, n_buckets, frac)],
        "n long, avgdl double, sum_dl long, n_buckets int, max_df_frac double",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, "stats_v2"))

    for name in ("postings", "df", "stats"):
        shutil.rmtree(os.path.join(out_dir, name))
        os.rename(os.path.join(out_dir, name + "_v2"), os.path.join(out_dir, name))
    for name in ("deltas", "df_deltas", "stats_deltas"):
        shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    return len(batches)


def bm25_sql(
    query_rows: list[tuple],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
) -> str:
    """The DuckDB replay of ``bm25_topk`` over the ``documents`` view:
    same tokenizer regex, same Lucene idf, same rounding and
    tie-break — an independent recomputation, not an export."""
    qvals = ", ".join(
        f"({qid}, '{text.replace(chr(39), chr(39) * 2)}')" for qid, text in query_rows
    )
    return f"""
      WITH q(q_id, query) AS (VALUES {qvals}),
      toks AS (
        SELECT doc_id, unnest(list_filter(
          regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), t -> t != '')) AS term
        FROM documents
      ),
      postings AS (
        SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
      ),
      dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY 1),
      stats AS (SELECT count(*)::DOUBLE AS n, avg(dl)::DOUBLE AS avgdl FROM dl),
      dfs AS (
        SELECT term, count(*)::DOUBLE AS df FROM postings GROUP BY 1
      ),
      qterms AS (
        SELECT DISTINCT q_id, unnest(list_filter(
          regexp_split_to_array(lower(query), '{TOKEN_SPLIT}'), t -> t != '')) AS term
        FROM q
      ),
      qidf AS (
        SELECT q.q_id, q.term,
               ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS idf
        FROM qterms q JOIN dfs d ON d.term = q.term CROSS JOIN stats s
        WHERE d.df <= {max_df_frac} * s.n
      ),
      contrib AS (
        SELECT qi.q_id, p.doc_id,
               qi.idf * (p.tf * (1.0 + {k1})) /
                 (p.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)) AS s
        FROM postings p
        JOIN dl l ON l.doc_id = p.doc_id
        JOIN qidf qi ON qi.term = p.term
        CROSS JOIN stats s
      ),
      scored AS (
        SELECT q_id, doc_id, round(sum(s), 6) AS score FROM contrib GROUP BY 1, 2
      )
      SELECT q_id::BIGINT AS q_id, doc_id::BIGINT AS doc_id, score::DOUBLE AS score,
             rank::BIGINT AS rank
      FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
        FROM scored
      ) WHERE rank <= {k}
    """
