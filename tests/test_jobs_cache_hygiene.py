"""Cache hygiene of the composed production jobs (VERDICT r3 #8).

Every operator that persists an intermediate (bloom-probed frame,
banded LSH signatures, shingle table, fuzzy-dedup input) exposes a
``handles=`` list; the composed jobs must collect those handles and
unpersist after the final write — otherwise a 7-stage run holds every
stage's cached blocks for its whole lifetime.

The assertion targets the SQL CacheManager (where ``DataFrame.persist``
registers), not ``getPersistentRDDs``: the components loop's
``localCheckpoint`` RDDs are lineage-truncation artifacts freed
asynchronously by the ContextCleaner and would make a raw RDD count
flaky, while a leaked DataFrame persist sits in the CacheManager
deterministically.
"""

import pytest


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture()
def pages_parquet(spark, tmp_path):
    from json_remedy_spark.sources.webpages import synthesize_corpus

    path = str(tmp_path / "pages")
    docs, _ = synthesize_corpus(spark, 300, partitions=4)
    docs.write.parquet(path)
    return path


def test_corpus_pipeline_job_frees_all_persists(spark, pages_parquet, tmp_path):
    """Full composition — line dedup, dup-span, incremental gate,
    fuzzy dedup, decontamination, packing — leaves the SQL cache empty."""
    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    assert _sql_cache_empty(spark)

    out1 = str(tmp_path / "out1")
    rep_out = str(tmp_path / "report")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out1,
         "--dup-span-window", "8", "--token-budget", "2000",
         "--shard-tokens", "500", "--report-out", rep_out]
    ))
    assert " in -> " in msg
    assert _sql_cache_empty(spark), "corpus job leaked persisted DataFrames"
    import os

    assert any(d.startswith("shard=") for d in os.listdir(out1))

    # --report-out: the run ships its own dataset card (parquet + md)
    import duckdb

    card = duckdb.sql(
        f"SELECT lang, n_docs, total_tokens, mean_tokens, p50_tokens, p90_tokens "
        f"FROM read_parquet('{rep_out}/*.parquet')"
    ).fetchall()
    assert card and all(r[1] > 0 and r[2] > 0 for r in card)
    md = open(rep_out + "_CARD.md").read()
    assert "| lang |" in md and "Dataset card" in md

    # plain run pair: the rerun gates against the first run's output
    # and exercises the incremental gate's bloom-probed persist
    # (ADVICE r3 #4) — gate text equals stored text only without the
    # rewriting/packing stages, so identical plain flags both times
    out2 = str(tmp_path / "out2")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out2]
    ))
    out3 = str(tmp_path / "out3")
    msg3 = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out3, "--seen-input", out2]
    ))
    assert "-> 0 out" in msg3  # everything already seen
    assert _sql_cache_empty(spark), "incremental gate leaked the probed frame"


def test_dedup_job_frees_all_persists(spark, tmp_path):
    from jobs.run_dedup import build_parser, run

    spark.catalog.clearCache()
    assert _sql_cache_empty(spark)

    msg = run(spark, build_parser().parse_args(
        ["--input", "/root/testdata/sf0.001/documents.parquet",
         "--sig-dir", str(tmp_path / "sig"),
         "--output", str(tmp_path / "out"),
         "--buckets", "4", "--threshold", "0.5"]
    ))
    assert "docs=" in msg and "kept=" in msg
    assert _sql_cache_empty(spark), "dedup job leaked persisted DataFrames"


def test_dedup_job_embedding_path_frees_all_persists(spark, tmp_path):
    from jobs.run_dedup import build_parser, run

    spark.catalog.clearCache()
    msg = run(spark, build_parser().parse_args(
        ["--input", "/root/testdata/sf0.001/embeddings.parquet",
         "--sig-dir", str(tmp_path / "sig"),
         "--output", str(tmp_path / "out"),
         "--embeddings", "--id-col", "vec_id", "--threshold", "0.9"]
    ))
    assert msg.startswith("signatures=embedding-lsh")
    assert _sql_cache_empty(spark), "embedding dedup path leaked persists"


def test_corpus_pipeline_robots_and_boilerplate(spark, pages_parquet, tmp_path):
    """--robots-input drops a disallowed host's pages before any spend
    and --boilerplate-frac plumbs the host-template stage (a no-op on
    this one-page-per-host corpus — the operator's effect is covered by
    its oracle and unit tests); the cache stays clean."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "rb_base")
    run(spark, build_parser().parse_args(["--input", pages_parquet, "--output", base_out]))
    base = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{base_out}/*.parquet')").fetchall()}
    victim = sorted(base)[0]
    host = victim.split("/")[2]

    robots_path = str(tmp_path / "robots")
    spark.createDataFrame(
        [(host, "User-agent: *\nDisallow: /\n")], ["host", "robots_txt"]
    ).write.parquet(robots_path)

    out = str(tmp_path / "rb_gated")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out,
         "--robots-input", robots_path, "--boilerplate-frac", "0.5"]
    ))
    assert " in -> " in msg
    got = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert victim in base and victim not in got
    assert not {u for u in got if u.split("/")[2] == host}
    assert _sql_cache_empty(spark), "robots/boilerplate stages leaked persists"


def test_corpus_pipeline_model_gate(spark, pages_parquet, tmp_path):
    """--quality-model builtin: the model gate runs map-only, output is
    a subset of the ungated run, and nothing stays persisted."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "base")
    run(spark, build_parser().parse_args(["--input", pages_parquet, "--output", base_out]))
    gated_out = str(tmp_path / "gated")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", gated_out, "--quality-model", "builtin"]
    ))
    assert " in -> " in msg
    assert _sql_cache_empty(spark), "model gate leaked persisted DataFrames"
    base = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{base_out}/*.parquet')").fetchall()}
    gated = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{gated_out}/*.parquet')").fetchall()}
    assert gated <= base


def test_corpus_pipeline_dsir_and_lm_export(spark, pages_parquet, tmp_path):
    """--dsir-target/--dsir-n keeps exactly N docs (a subset of the
    unselected run), --train-lm-out exports loadable model tables, and
    neither stage leaks persisted DataFrames."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "base")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", base_out]))
    base = {r[0] for r in duckdb.sql(
        f"SELECT url FROM read_parquet('{base_out}/*.parquet')").fetchall()}

    lm_dir = str(tmp_path / "lm")
    sel_out = str(tmp_path / "sel")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", sel_out,
         "--dsir-target", pages_parquet, "--dsir-n", "25",
         "--train-lm-out", lm_dir]
    ))
    assert " -> 25 out" in msg
    assert _sql_cache_empty(spark), "DSIR/LM stages leaked persisted DataFrames"
    sel = {r[0] for r in duckdb.sql(
        f"SELECT url FROM read_parquet('{sel_out}/*.parquet')").fetchall()}
    assert len(sel) == 25 and sel <= base

    # the exported model is directly loadable and finite everywhere
    import numpy as np

    from json_remedy_spark.functions.perplexity import load_model_tables

    dense = load_model_tables(
        f"{lm_dir}/corpus_tri.parquet", f"{lm_dir}/corpus_bi.parquet"
    )
    assert np.isfinite(dense).all() and (dense < 0).all()


def test_corpus_pipeline_fuzzy_decon(spark, pages_parquet, tmp_path):
    """--fuzzy-decon with --eval-input drives the bipartite LSH gate:
    a run decontaminated against ITSELF drops everything that survives
    the earlier stages (every doc exact-matches its eval twin), and
    the job leaks no persists."""
    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "base")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", base_out]))
    base_n = spark.read.parquet(base_out).count()
    assert base_n > 0

    # eval set = the cleaned output itself -> fuzzy gate drops all
    import duckdb

    out = str(tmp_path / "fz")
    ev = str(tmp_path / "ev")
    duckdb.sql(
        f"COPY (SELECT row_number() OVER () AS doc_id, text "
        f"FROM read_parquet('{base_out}/*.parquet')) TO '{ev}' (FORMAT PARQUET)"
    )
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out,
         "--eval-input", ev, "--fuzzy-decon", "0.9"]
    ))
    assert " -> 0 out" in msg
    assert _sql_cache_empty(spark), "fuzzy decon leaked persisted DataFrames"


def test_corpus_pipeline_mixture_and_bpe_export(spark, pages_parquet, tmp_path):
    """--mixture upsamples a language deterministically (unique ids
    preserved), --train-bpe-out exports a loadable merge table; no
    leaked persists."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "base")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", base_out]))
    base_n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{base_out}/*.parquet')").fetchone()[0]

    out = str(tmp_path / "mix")
    bpe_out = str(tmp_path / "bpe")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out,
         "--mixture", "en=2.0", "--train-bpe-out", bpe_out,
         "--bpe-merges", "10"]
    ))
    assert _sql_cache_empty(spark), "mixture/bpe stages leaked persists"
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n > base_n  # english docs doubled
    merges = duckdb.sql(
        f"SELECT rank, a, b FROM read_parquet('{bpe_out}/*.parquet') ORDER BY rank"
    ).fetchall()
    assert len(merges) == 10 and [m[0] for m in merges] == list(range(10))


def test_corpus_pipeline_ppl_keep(spark, pages_parquet, tmp_path):
    """--ppl-keep head,middle drops the per-language worst tertile
    (about a third of the base output) and leaks no persists."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "base")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", base_out]))
    base_n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{base_out}/*.parquet')").fetchone()[0]

    out = str(tmp_path / "hm")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out, "--ppl-keep", "head,middle"]
    ))
    assert _sql_cache_empty(spark), "ppl-keep stage leaked persists"
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    # tertiles are grid-quantized: allow slack around 2/3 but require a
    # real cut
    assert 0 < n < base_n
    assert n <= 0.85 * base_n


def test_corpus_pipeline_blocklist(spark, pages_parquet, tmp_path):
    """--blocklist-input drops a banned host's pages (and would drop
    subdomains) before any downstream spend; cache stays clean."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    base_out = str(tmp_path / "bl_base")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", base_out]))
    base = {r[0] for r in duckdb.sql(
        f"SELECT url FROM read_parquet('{base_out}/*.parquet')").fetchall()}
    victim_host = sorted(base)[0].split("/")[2]

    bl_path = str(tmp_path / "bl")
    spark.createDataFrame(
        [(victim_host, "test-ban")], "host string, category string"
    ).write.parquet(bl_path)
    out = str(tmp_path / "bl_gated")
    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out,
         "--blocklist-input", bl_path]
    ))
    assert " in -> " in msg
    got = {r[0] for r in duckdb.sql(
        f"SELECT url FROM read_parquet('{out}/*.parquet')").fetchall()}
    assert not {u for u in got if u.split("/")[2] == victim_host}
    assert got < base
    assert _sql_cache_empty(spark), "blocklist stage leaked persists"


def test_corpus_pipeline_dsir_ratio_reuse(spark, pages_parquet, tmp_path):
    """--dsir-ratio-out exports the fitted ratio; a second run with
    --dsir-ratio (no target) selects the SAME documents."""
    import duckdb

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    ratio = str(tmp_path / "ratio.parquet")
    out1 = str(tmp_path / "o1")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out1,
         "--dsir-target", pages_parquet, "--dsir-n", "20",
         "--dsir-ratio-out", ratio]))
    out2 = str(tmp_path / "o2")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", out2,
         "--dsir-ratio", ratio, "--dsir-n", "20"]))
    assert _sql_cache_empty(spark)
    a = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{out1}/*.parquet')").fetchall()}
    b = {r[0] for r in duckdb.sql(f"SELECT url FROM read_parquet('{out2}/*.parquet')").fetchall()}
    assert a == b and len(a) == 20


def test_dedup_job_exact_collapse_parity(spark, tmp_path):
    """The job's shingle-SET pre-collapse (quadratic-pair guard,
    caught by the sf1 rehearsal: a 56k-doc set-identical boilerplate
    family at 200k docs = 9e9 intra-bucket pairs) must NOT change the
    output: (doc_id, rep_id, is_canonical) equals the direct
    uncollapsed lsh_verified_pairs -> components labeling on the same
    input, including byte-identical groups, set-identical-but-
    distinct texts (cyclic word repeats), near-dup bridges into those
    groups, and singletons."""
    from jobs.run_dedup import build_parser, run
    from json_remedy_spark.functions.dedup import (
        components_from_pairs,
        lsh_verified_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "to the forest where it hides under an old oak tree for hours"
    )
    near = base + " until dusk"  # high-jaccard near-dup of the group text
    rows = (
        [(i, base) for i in range(6)]          # exact group, rep 0
        + [(10, near)]                          # bridges into the group
        + [(20, "completely unrelated spark engine text about shuffles "
                "partitions and adaptive query execution plans")]
        + [(21, "another standalone document describing parquet column "
                "pruning and predicate pushdown behaviour in detail")]
        + [(30, "zz twin text shared by exactly two documents here yes")]
        + [(31, "zz twin text shared by exactly two documents here yes")]
        # DISTINCT texts, IDENTICAL 3-word shingle sets (cyclic repeat)
        + [(40, "red green blue red green blue red green blue")]
        + [(41, "red green blue red green blue")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    run(spark, build_parser().parse_args(
        ["--input", src, "--sig-dir", str(tmp_path / "sig"),
         "--output", str(tmp_path / "out"), "--buckets", "2",
         "--threshold", "0.5"]
    ))
    got = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )

    direct = sorted(
        tuple(r)
        for r in components_from_pairs(
            docs.select("doc_id"), lsh_verified_pairs(docs, 0.5)
        ).collect()
    )
    assert got == direct
    # and the semantics are the expected ones: one canonical per group
    reps = {d: (r, c) for d, r, c in got}
    assert reps[0] == (0, True) and reps[5] == (0, False)
    assert reps[10] == (0, False)            # near-dup joined the group
    assert reps[20] == (20, True) and reps[21] == (21, True)
    assert reps[30] == (30, True) and reps[31] == (30, False)
    assert reps[40] == (40, True) and reps[41] == (40, False)


def test_corpus_pipeline_url_gate(spark, tmp_path):
    """--url-gate drops spam-signal URLs (nonstandard port, digit-heavy
    host, parameter blowup) BEFORE any page byte is read, keeps clean
    ones, and leaves the SQL cache empty.  The gate thresholds are the
    shared webgraph.URL_GATE definition — the same ones the
    corpus_funnel oracle replays."""
    from pyspark.sql import functions as F

    from jobs.run_corpus_pipeline import build_parser, run

    spark.catalog.clearCache()
    from json_remedy_spark.sources.webpages import make_row

    # generator rows that the quality filter keeps (JSON-bearing, en),
    # re-addressed onto the urls under test — each body is DISTINCT so
    # fuzzy dedup leaves them alone
    def body(i):
        return make_row(i)["text"]

    seeds = [4, 5, 6, 8, 9, 10, 11, 12]
    rows = [
        (f"http://site{i}.example.com/articles/post{i}", body(s), "en")
        for i, s in enumerate(seeds)
    ] + [
        ("http://dev.example.com:8080/staging/post", body(13), "en"),
        ("http://4455667788.example.com/x", body(14), "en"),
        ("http://a.example.com/p?a=1&b=2&c=3&d=4&e=5", body(16), "en"),
        ("http://spamfarm.example.com/landing", body(17), "en"),
    ]
    pages = spark.createDataFrame(rows, ["url", "text", "lang"])
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    # host link graph: the 8 clean sites form a cycle (rank ~1.0 each);
    # spamfarm only points outward, so its rank stays at the 0.15
    # no-in-links floor — the bottom-10% cut drops exactly it
    links = [
        (f"site{i}.example.com", f"site{(i + 1) % 8}.example.com") for i in range(8)
    ] + [("spamfarm.example.com", "site0.example.com")]
    links_src = str(tmp_path / "links")
    spark.createDataFrame(links, ["src", "dst"]).write.parquet(links_src)

    out = str(tmp_path / "out")
    msg = run(spark, build_parser().parse_args(
        ["--input", src, "--output", out, "--url-gate",
         "--rank-input", links_src]
    ))
    assert msg.startswith("corpus: 8 in")  # 3 URL-gate + 1 rank drop never count
    kept = spark.read.parquet(out)
    assert kept.where(F.col("url").contains(":8080")).count() == 0
    assert kept.where(F.col("url").contains("4455667788")).count() == 0
    assert kept.where(F.col("url").contains("?a=1")).count() == 0
    assert kept.where(F.col("url").contains("spamfarm")).count() == 0
    # the shared-body site pages fuzzy-dedup to one canonical survivor,
    # and every survivor is a clean ranked host
    assert kept.count() >= 1
    assert kept.where(~F.col("url").startswith("http://site")).count() == 0
    assert _sql_cache_empty(spark), "url-gate/rank path leaked persists"


def test_dedup_job_incremental_cross_dump_parity(spark, tmp_path):
    """--seen-signatures mode (dump-over-dump, the production cadence):
    processing dump B against dump A's at-rest signature table + prior
    components reproduces the ONE-SHOT union labeling byte-for-byte,
    while dump A's signature table is never rewritten (the minhash
    kernel runs over B only)."""
    import os

    from jobs.run_dedup import build_parser, run

    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src_a, src_b, src_u = (str(tmp_path / d) for d in ("a", "b", "u"))
    docs.where("doc_id % 3 <> 0").write.parquet(src_a)
    docs.where("doc_id % 3 = 0").write.parquet(src_b)
    docs.write.parquet(src_u)

    sig_a, out_a = str(tmp_path / "sigA"), str(tmp_path / "outA")
    run(spark, build_parser().parse_args(
        ["--input", src_a, "--sig-dir", sig_a, "--output", out_a,
         "--buckets", "4", "--threshold", "0.5"]
    ))
    snap = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(sig_a) for p in fs
    }

    out_b = str(tmp_path / "outB")
    msg = run(spark, build_parser().parse_args(
        ["--input", src_b, "--sig-dir", str(tmp_path / "sigB"),
         "--output", out_b, "--buckets", "4", "--threshold", "0.5",
         "--seen-signatures", sig_a, "--seen-docs", src_a,
         "--seen-components", out_a]
    ))
    assert "docs=" in msg
    assert _sql_cache_empty(spark), "incremental dedup leaked persists"

    out_u = str(tmp_path / "outU")
    run(spark, build_parser().parse_args(
        ["--input", src_u, "--sig-dir", str(tmp_path / "sigU"),
         "--output", out_u, "--buckets", "4", "--threshold", "0.5"]
    ))

    got = sorted(tuple(r) for r in spark.read.parquet(out_b).collect())
    want = sorted(tuple(r) for r in spark.read.parquet(out_u).collect())
    assert got == want and len(got) == docs.count()

    # dump A's at-rest signatures were read, never rewritten
    after = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(sig_a) for p in fs
    }
    assert after == snap

    # missing companion inputs fail loudly, not silently non-incremental
    import pytest

    with pytest.raises(SystemExit):
        run(spark, build_parser().parse_args(
            ["--input", src_b, "--sig-dir", str(tmp_path / "sigX"),
             "--output", str(tmp_path / "outX"),
             "--seen-signatures", sig_a]
        ))


def test_corpus_pipeline_soft_dedup(spark, tmp_path):
    """--soft-dedup keeps EVERY fuzzy near-dup with a weight column:
    total mass equals the hard-dedup keep count (exponent 1), weights
    within a cluster are 1/size, and the cache drains."""
    from jobs.run_corpus_pipeline import build_parser, run
    from json_remedy_spark.sources.webpages import synthesize_corpus

    docs, labels = synthesize_corpus(spark, 120, partitions=4)
    # a 3-way near-dup family derived from a doc the quality filter
    # provably KEEPS (so it reaches the fuzzy stage), with per-member
    # suffixes so the url/line-dedup stages don't collapse it first
    # the family's variation must live INSIDE a long string VALUE:
    # the repair layer strips trailing wrapper text (an appended
    # suffix leaves all members byte-identical -> exact dedup eats
    # them) and emits compact JSON (whitespace only survives inside
    # strings — and the fuzzy shingles are whitespace 3-grams)
    sentence = (
        "the geological survey of the northern region describes how basalt "
        "and granite formations near the wide river valley were shaped over "
        "many thousands of years by slow cooling and steady erosion while "
        "several field teams recorded the layers in careful detail and the "
        "museum kept every sample for later study of the mineral record"
    )
    fam = [
        (
            f"https://rocks.example/{i}",
            '{"title": "field notes", "desc": "' + sentence + f' site{i} marker{i}"' + "}",
        )
        for i in range(3)
    ]
    extra = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in fam],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages = str(tmp_path / "pages")
    docs.unionByName(extra).write.parquet(pages)

    spark.catalog.clearCache()
    soft_out, hard_out = str(tmp_path / "soft"), str(tmp_path / "hard")
    run(spark, build_parser().parse_args(
        ["--input", pages, "--output", soft_out, "--threshold", "0.5",
         "--soft-dedup", "1.0"]
    ))
    assert _sql_cache_empty(spark), "soft-dedup path leaked persists"
    run(spark, build_parser().parse_args(
        ["--input", pages, "--output", hard_out, "--threshold", "0.5"]
    ))

    soft = spark.read.parquet(soft_out)
    hard_n = spark.read.parquet(hard_out).count()
    assert "weight" in soft.columns
    fam_rows = soft.where(soft.url.startswith("https://rocks.example/")).collect()
    assert len(fam_rows) == 3  # soft keeps the whole family
    # the base doc (still in the corpus) typically joins the cluster,
    # so derive the size from the weight instead of hardcoding 3
    w = fam_rows[0]["weight"]
    assert all(abs(r["weight"] - w) < 1e-6 for r in fam_rows)
    cluster = round(1 / w)
    assert cluster >= 3 and abs(w - 1 / cluster) < 1e-6
    # exponent 1: cluster mass = 1 -> total mass == hard keep count
    mass = soft.agg({"weight": "sum"}).first()[0]
    assert abs(mass - hard_n) < 1e-3
    assert soft.count() == hard_n + (cluster - 1)  # the non-canonical dups


def test_corpus_pipeline_qc_bootstrap_loop(spark, pages_parquet, tmp_path):
    """The DCLM bootstrap composes across runs: crawl N exports the
    distilled classifier as a SINGLE parquet file (addFile rejects
    directories), crawl N+1's --quality-model gate ships and applies
    it; the cache drains both times."""
    from jobs.run_corpus_pipeline import build_parser, run
    from json_remedy_spark.functions.langid import load_ft_model

    spark.catalog.clearCache()
    model = str(tmp_path / "qc_model.parquet")
    run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", str(tmp_path / "n"),
         "--train-qc-out", model]
    ))
    assert _sql_cache_empty(spark), "qc training leaked persists"
    import os

    assert os.path.isfile(model)  # a FILE — the addFile-shippable form
    dense, classes = load_ft_model(model)
    assert classes == ["hi", "lo"] and (dense != 0).sum() == 512

    msg = run(spark, build_parser().parse_args(
        ["--input", pages_parquet, "--output", str(tmp_path / "n1"),
         "--quality-model", model]
    ))
    assert " in -> " in msg
    assert _sql_cache_empty(spark)
    # the gate is downstream of the teacher rules, so the distilled
    # model must keep (nearly) everything the rules kept
    n_plain = spark.read.parquet(str(tmp_path / "n")).count()
    n_gated = spark.read.parquet(str(tmp_path / "n1")).count()
    assert n_gated >= 0.9 * n_plain


def _near_dup_family_pages(spark, tmp_path, n_members=3):
    """A base corpus plus a 3-way near-dup family the RULE gate keeps
    (variation inside a long string value — see the soft-dedup test
    for why), written as a pages parquet.  Returns (path, marker)."""
    from json_remedy_spark.sources.webpages import synthesize_corpus

    docs, _ = synthesize_corpus(spark, 120, partitions=4)
    sentence = (
        "the geological survey of the northern region describes how basalt "
        "and granite formations near the wide river valley were shaped over "
        "many thousands of years by slow cooling and steady erosion while "
        "several field teams recorded the layers in careful detail and the "
        "museum kept every sample for later study of the mineral record"
    )
    fam = [
        (
            f"https://rocks.example/{i}",
            '{"title": "field notes", "desc": "' + sentence + f' site{i} marker{i}"' + "}",
        )
        for i in range(n_members)
    ]
    extra = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in fam],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    path = str(tmp_path / "pages_fam")
    docs.unionByName(extra).write.parquet(path)
    return path, "basalt"


def test_qc_training_excludes_dedup_dropped_docs(spark, tmp_path, monkeypatch):
    """ADVICE r5 (medium): --train-qc-out negatives are the docs the
    RULE gate dropped — near-dup copies of kept docs, which fuzzy
    dedup (not the rules) removed, must NOT be labeled 'lo'."""
    import jobs.run_corpus_pipeline as jobmod
    from json_remedy_spark.functions import classifier as clf

    captured = {}
    real_train = clf.train_quality_classifier

    def spy(labeled, **kw):
        captured["lo_with_marker"] = labeled.where(
            (labeled.label == "lo") & labeled.text.contains(marker)
        ).count()
        captured["hi_with_marker"] = labeled.where(
            (labeled.label == "hi") & labeled.text.contains(marker)
        ).count()
        return real_train(labeled, **kw)

    monkeypatch.setattr(clf, "train_quality_classifier", spy)

    pages, marker = _near_dup_family_pages(spark, tmp_path)
    out = str(tmp_path / "out")
    spark.catalog.clearCache()
    jobmod.run(spark, jobmod.build_parser().parse_args(
        ["--input", pages, "--output", out, "--threshold", "0.5",
         "--train-qc-out", str(tmp_path / "qc.parquet")]
    ))
    assert _sql_cache_empty(spark)

    # fuzzy dedup kept exactly one family member...
    final = spark.read.parquet(out)
    kept_fam = final.where(final.text.contains(marker)).count()
    assert kept_fam == 1
    # ...and the dedup-dropped near-dup copies were excluded from the
    # negative class (they'd share the canonical's bigram features)
    assert captured["lo_with_marker"] == 0
    assert captured["hi_with_marker"] == 1


def test_soft_dedup_pack_sequences_weight_side_table(spark, tmp_path):
    """ADVICE r5: --soft-dedup + --pack-sequences writes the sampling
    weight as a (doc_id, weight) side table next to the packed output
    (pack_sequences' fixed schema would otherwise discard it)."""
    from jobs.run_corpus_pipeline import build_parser, run

    pages, _ = _near_dup_family_pages(spark, tmp_path)
    out = str(tmp_path / "packed")
    spark.catalog.clearCache()
    run(spark, build_parser().parse_args(
        ["--input", pages, "--output", out, "--threshold", "0.5",
         "--soft-dedup", "1.0", "--pack-sequences", "64"]
    ))
    assert _sql_cache_empty(spark)

    packed = spark.read.parquet(out)
    assert {"seq_id", "doc_id", "pos_in_seq", "n_tokens", "text"} <= set(packed.columns)
    weights = spark.read.parquet(out + "_weights")
    assert set(weights.columns) == {"doc_id", "weight"}
    # every packed doc carries a weight, soft-dedup kept near-dups so
    # at least one weight is fractional
    pd_ids = {r["doc_id"] for r in packed.select("doc_id").distinct().collect()}
    w_ids = {r["doc_id"] for r in weights.collect()}
    assert pd_ids <= w_ids
    assert weights.where(weights.weight < 0.999).count() >= 2


def test_ivf_rerank_shortlist_handle_unpersists(spark, tmp_path):
    """r07 (ADVICE r6): ivf_topk_from_index(rerank_from=...) persists
    its ADC shortlist; the new handles= contract exposes it so callers
    can leave the SQL cache empty after consuming the result."""
    import numpy as np
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(300)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "pq_idx")
    write_ivf_index(vecs, idx, cells=4, quantize="pq", pq_m=4, pq_ksub=16)

    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    spark.catalog.clearCache()
    handles: list = []
    out = ivf_topk_from_index(
        spark, idx, queries, k=3, probes=2, rerank_from=vecs, handles=handles
    )
    rows_out = out.collect()
    assert rows_out and handles, "rerank path must expose its persisted shortlist"
    for h in handles:
        h.unpersist()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
