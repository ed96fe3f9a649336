"""Operator tests: dedup, similarity, multimodal, streaming, checkpoint."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (3, "completely different text about spark pipelines and arrow batches"),
        (4, "The  Quick  Brown  Fox  Jumps  Over  The  Lazy  Dog"),  # ws/case dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    from json_remedy_spark.functions.dedup import exact_dedup

    out = exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[0] == 3  # 0, 1, 4 normalize identically
    assert groups[2] == 1 and groups[3] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    from json_remedy_spark.functions.dedup import lsh_candidate_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup should band-collide
    assert not any(3 in p for p in pairs)  # unrelated doc stays out


def test_jaccard_pairs(spark, docs):
    from json_remedy_spark.functions.dedup import jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0


def test_simhash_hamming(spark, docs):
    from json_remedy_spark.functions.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[0] == fp[1] == fp[4]
    # mask to unsigned 64: fingerprints with bit 63 set are negative longs
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])


def test_cosine_topk_exact(spark):
    from json_remedy_spark.functions.similarity import cosine_topk

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(100, [1.0, 0.0, 0.0])], ["q_id", "embedding"])
    top = cosine_topk(vecs, q, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    assert top[0]["cos"] == 1.0


def test_lsh_ann_recall(spark):
    """ANN must return the true top-1 for self-queries (same bucket)."""
    from json_remedy_spark.functions.similarity import lsh_bucketed_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    top1 = lsh_bucketed_topk(emb, q, k=1).collect()
    assert all(r["vec_id"] == r["q_id"] and r["cos"] == 1.0 for r in top1)


def test_multimodal_plumbing(spark):
    from json_remedy_spark.functions.multimodal import N_FRAMES, frame_sample, image_features, media_meta

    df = spark.createDataFrame(
        [("u1", bytearray(b"\x89PNG1234567890")), ("u2", bytearray(b"<html>hi</html>"))],
        "url string, html binary",
    )
    meta = {r["url"]: r["media_type"] for r in media_meta(df).collect()}
    assert meta == {"u1": "image/png", "u2": "text/html"}
    feats = image_features(df).collect()
    assert all(len(r["feature"]) == 16 for r in feats)
    assert abs(sum(feats[0]["feature"]) - 1.0) < 1e-3
    frames = frame_sample(df).collect()
    assert len(frames) == 2 * N_FRAMES


def test_streaming_repair(spark, tmp_path):
    from json_remedy_spark.streaming.stream_repair import run_once

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "a.txt").write_text(
        '{"a": 1}\n{bad: "json",}\nplain prose line no json\n{"c": [1,2,]}\n'
    )
    out_dir = str(tmp_path / "out")
    run_once(spark, str(in_dir), out_dir, str(tmp_path / "ckpt"))
    got = {r["repaired"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {'{"a":1}', '{"bad":"json"}', '{"c":[1,2]}'}  # prose line dropped


def test_repair_udf_forwards_options(spark):
    """Per-call kernel toggles reach the executors through the UDF
    closure: multi-JSON aggregation off turns `[]{}` into `[]` vs an
    error/second-doc drop difference observable in the output."""
    from json_remedy_spark.operators.repair_udf import make_repair_udf

    df = spark.createDataFrame([("{'a': 1}",)], ["text"])
    on = df.select(make_repair_udf()(F.col("text")).alias("r")).select("r.repaired").first()[0]
    strict = (
        df.select(make_repair_udf(strict_mode=True)(F.col("text")).alias("r"))
        .select("r.ok", "r.repaired")
        .first()
    )
    assert on == '{"a":1}'
    assert strict["ok"] is False  # strict mode: validate-only, no repair


def test_checkpoint_resume(spark, tmp_path):
    from json_remedy_spark.operators.checkpoint import committed_buckets, run_with_checkpoints

    df = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"), F.col("id")
    )
    out = str(tmp_path / "ckout")
    calls = []

    def fn(part):
        calls.append(1)
        return part.withColumn("y", F.col("id") * 2)

    first = run_with_checkpoints(fn, df, out, n_buckets=4)
    assert len(first) == 4 and committed_buckets(out) == {0, 1, 2, 3}
    second = run_with_checkpoints(fn, df, out, n_buckets=4)
    assert second == []  # resume: nothing recomputed
    total = spark.read.parquet(os.path.join(out, "part_bucket=0")).count()
    assert total > 0


def test_lsh_signature_table_at_rest(spark, tmp_path):
    """The 100 TB LSH form: signatures land bucketed at rest once;
    candidates from the stored table match the in-memory path exactly,
    and a killed signature job resumes bucket-by-bucket."""
    import shutil

    from json_remedy_spark.functions.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_from_table,
        write_signature_table,
    )
    from json_remedy_spark.operators.checkpoint import committed_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    out = str(tmp_path / "sigs")
    fmt = write_signature_table(docs, out, n_buckets=4)
    assert fmt == "parquet+manifest" and committed_buckets(out) == {0, 1, 2, 3}
    mem = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    stored = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs_from_table(spark, out).collect()}
    assert stored == mem and stored

    # resume drill: lose one committed bucket; the rewrite recomputes
    # ONLY that bucket (manifest-driven) and restores exact parity
    shutil.rmtree(os.path.join(out, "part_bucket=2"))
    os.remove(os.path.join(out, "_manifest", "bucket-2.json"))
    assert committed_buckets(out) == {0, 1, 3}
    write_signature_table(docs, out, n_buckets=4)
    assert committed_buckets(out) == {0, 1, 2, 3}
    stored2 = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs_from_table(spark, out).collect()}
    assert stored2 == mem


def test_py_files_zip_imports(tmp_path):
    """The --py-files artifact must carry a working package: import the
    kernel from the zip alone (fresh interpreter, no repo on the path)."""
    import subprocess
    import sys as _sys

    from tools.make_dist import build

    zip_path = build(str(tmp_path / "json_remedy_spark.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from json_remedy_spark.kernel import repair\n"
        "r = repair('{a: 1,}')\n"
        "assert r.ok and r.repaired == '{\"a\":1}', r\n"
        "print('zip-import-ok')\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code, zip_path],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo so the zip is the only source
        env={"PATH": os.environ.get("PATH", "")},
        timeout=120,
    )
    assert out.returncode == 0 and "zip-import-ok" in out.stdout, out.stderr


def test_checkpoint_key_threading(spark, tmp_path):
    """run_with_checkpoints buckets by the caller's key column (the
    catalog fallback used to hardcode 'url')."""
    from json_remedy_spark.operators.checkpoint import run_with_checkpoints

    df = spark.range(50).select(F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("h"))
    out = str(tmp_path / "keyed")
    run_with_checkpoints(lambda p: p, df, out, n_buckets=3, key="doc_id")
    assert spark.read.parquet(out).count() == 50


def test_salted_repartition_is_deterministic_data(spark):
    from json_remedy_spark.operators.pipeline import salted_repartition

    df = spark.range(1000).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    out = salted_repartition(df, 8)
    assert out.count() == 1000


def test_streaming_windowed_metrics(spark, tmp_path):
    """Watermarked tumbling-window repair metrics over a file stream."""
    import datetime as dt

    from json_remedy_spark.streaming.stream_repair import repair_metrics_stream

    src = tmp_path / "stream_src"
    src.mkdir()
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (base, '{"a": 1}'),
        (base + dt.timedelta(seconds=30), "{bad: json,}"),
        (base + dt.timedelta(minutes=1, seconds=10), "plain prose line"),
        (base + dt.timedelta(minutes=1, seconds=40), '{"c": [1,2,]}'),
    ]
    spark.createDataFrame(rows, "ts timestamp, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = spark.readStream.schema("ts timestamp, text string").parquet(str(src))
    agg = repair_metrics_stream(stream, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].minute, r["ok"]): r["docs"]
        for r in spark.sql("select * from win_metrics").collect()
    }
    assert got[(0, True)] == 2   # {"a":1} + repaired {bad: json,}
    assert got[(1, True)] == 1   # {"c":[1,2,]}
    assert got[(1, False)] == 1  # prose line dropped


def test_ivf_ann_recall(spark):
    """IVF ANN must return the true top-1 for self-queries (vector's
    own cell is always probed)."""
    from json_remedy_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    top1 = ivf_topk(emb, q, k=1).collect()
    assert all(r["vec_id"] == r["q_id"] and r["cos"] == 1.0 for r in top1)


def test_winnow_fingerprints_overlap(spark, docs):
    """Near-dup docs share most fingerprints; unrelated docs share none."""
    from json_remedy_spark.functions.textstats import rolling_fingerprints

    fps = rolling_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] == by_doc[1] == by_doc[4]
    assert by_doc[0] & by_doc[2]          # near-dup overlaps
    assert not (by_doc[0] & by_doc[3])    # unrelated disjoint


def test_from_file_wholetext(spark, tmp_path):
    """from_file parity (lib/json_remedy.ex:182-187): whole file = one doc."""
    from json_remedy_spark.sources.readers import from_file

    p = tmp_path / "invalid.json"
    p.write_text('// header comment\n{name: "Weiss Savage", "age": 30,}\n')
    row = from_file(spark, str(p)).collect()[0]
    assert row["ok"] and row["repaired"] == '{"name":"Weiss Savage","age":30}'
    assert row["n_repairs"] > 0


def test_stateful_stream_dedup_across_restarts(spark, tmp_path):
    """applyInPandasWithState dedup: first occurrence wins, state
    survives a restart via the checkpoint."""
    from json_remedy_spark.streaming.stateful_dedup import run_once

    in_dir = tmp_path / "sin"
    in_dir.mkdir()
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    (in_dir / "a.txt").write_text("alpha doc\nbeta doc\nalpha doc\n")
    run_once(spark, str(in_dir), out, ckpt)
    got1 = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got1 == {"alpha doc", "beta doc"}

    # second run, new file: duplicate of alpha must stay dropped
    (in_dir / "b.txt").write_text("alpha doc\ngamma doc\n")
    run_once(spark, str(in_dir), out, ckpt)
    rows = spark.read.parquet(out).collect()
    texts = [r["text"] for r in rows]
    assert sorted(texts) == ["alpha doc", "beta doc", "gamma doc"]


def test_decontaminate_flags_shingle_overlap(spark):
    from json_remedy_spark.functions.corpus import decontaminate

    corp = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps high"),  # shares "the quick brown" etc.
            (1, "completely unrelated spark pipeline text"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, "the quick brown fox sat down")], ["doc_id", "text"])
    got = {r["doc_id"]: r["contaminated"] for r in decontaminate(corp, ev).collect()}
    assert got == {0: True, 1: False}


def test_pack_token_budget_floor_semantics(spark):
    """Docs taken in doc_id order; the doc that crosses the budget is
    the LAST one kept; later docs drop."""
    from json_remedy_spark.functions.corpus import pack_token_budget

    docs = spark.createDataFrame(
        [
            (0, "en", "a b c d"),  # 4 tokens, cum 4
            (1, "en", "e f g"),  # 3 tokens, cum 7 — crosses budget 6, kept
            (2, "en", "h i"),  # cum 9 — dropped (prefix sum 7 >= 6)
            (3, "fr", "x y z"),  # separate stratum, cum 3 < 6 — kept
        ],
        ["doc_id", "lang", "text"],
    )
    kept = {r["doc_id"]: r["cum_tokens"] for r in pack_token_budget(docs, 6).collect()}
    assert kept == {0: 4, 1: 7, 3: 3}


def test_pack_token_budget_two_phase_matches_single_window(spark):
    """Force many buckets (width 7) — the offset join must reproduce
    the single-bucket cumulative exactly."""
    from json_remedy_spark.functions.corpus import pack_token_budget

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", "w " * (i % 5 + 1)) for i in range(60)],
        ["doc_id", "lang", "text"],
    )
    multi = sorted(map(tuple, pack_token_budget(docs, 25, bucket_width=7).collect()))
    single = sorted(map(tuple, pack_token_budget(docs, 25, bucket_width=1 << 20).collect()))
    assert multi == single and multi


def test_contamination_overlap_consistent_with_gate(spark):
    """overlap_frac > 0 reproduces decontaminate's binary flag exactly,
    fractions are in [0,1], and a fully-eval-copied doc reads 1.0."""
    from json_remedy_spark.functions.corpus import contamination_overlap, decontaminate

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),       # exact eval copy -> 1.0
            (1, "alpha beta gamma unrelated words"),  # shares one 3-shingle
            (2, "completely different content"), # clean
        ],
        ["doc_id", "text"],
    )
    frac = {r["doc_id"]: r for r in contamination_overlap(docs, ev).collect()}
    gate = {r["doc_id"]: r["contaminated"] for r in decontaminate(docs, ev).collect()}
    assert frac[0]["overlap_frac"] == 1.0
    assert 0.0 < frac[1]["overlap_frac"] < 1.0
    assert frac[2]["overlap_frac"] == 0.0 and frac[2]["n_matched"] == 0
    for did, r in frac.items():
        assert (r["overlap_frac"] > 0) == gate[did]
        assert 0.0 <= r["overlap_frac"] <= 1.0 and r["n_matched"] <= r["n_shingles"]


def test_shard_by_tokens_contiguous_and_balanced(spark):
    """Shards are contiguous doc_id ranges; a doc lands in the shard
    its first token falls in, so every shard except the last holds at
    least shard_tokens minus its last doc's spillover."""
    from json_remedy_spark.functions.corpus import shard_by_tokens

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(100)], ["doc_id", "text"]
    )
    rows = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"], r["shard"])
        for r in shard_by_tokens(docs, 20).collect()
    )
    # prefix sums are exact and shards = floor(start_offset / 20)
    cum = 0
    prev_shard = 0
    for doc_id, n, c, s in rows:
        assert c == cum + n
        assert s == cum // 20
        assert s >= prev_shard  # monotone -> contiguous ranges
        cum = c
        prev_shard = s
    # every shard except the last covers its full 20-token stripe
    last = max(s for _, _, _, s in rows)
    tokens_by_shard = {}
    for _, n, _, s in rows:
        tokens_by_shard[s] = tokens_by_shard.get(s, 0) + n
    for s, tot in tokens_by_shard.items():
        if s != last:
            # stripe is full: next shard starts at or past (s+1)*20
            assert tot >= 20 - 6  # spillover bounded by max doc size - 1


def test_shard_by_tokens_two_phase_matches_single_window(spark):
    from json_remedy_spark.functions.corpus import shard_by_tokens

    docs = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1)) for i in range(60)], ["doc_id", "text"]
    )
    multi = sorted(map(tuple, shard_by_tokens(docs, 25, bucket_width=7).collect()))
    single = sorted(map(tuple, shard_by_tokens(docs, 25, bucket_width=1 << 20).collect()))
    assert multi == single and multi


def test_write_token_shards(spark, tmp_path):
    """The export writer lands one parquet dir per shard and the
    reloaded union is exactly the input."""
    from json_remedy_spark.functions.corpus import write_token_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "w " * (i % 9)) for i in range(200)], ["doc_id", "text"]
    )
    out = str(tmp_path / "shards")
    n_shards = write_token_shards(docs, out, shard_tokens=100)
    assert n_shards >= 2
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200
    # each shard dir is a contiguous doc_id range
    spans = sorted(
        (r["lo"], r["hi"])
        for r in back.groupBy("shard")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_new_operator_edges(spark, tmp_path):
    """Edge inputs stay total: empty corpora, probe counts past the
    cell count, and empty query sets return empty results, not errors."""
    from json_remedy_spark.functions.corpus import shard_by_tokens
    from json_remedy_spark.functions.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert shard_by_tokens(empty, 100).count() == 0

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    idx = str(tmp_path / "ivf_edge")
    write_ivf_index(e, idx, cells=4)
    q = e.where(F.col("vec_id") < 2).select(F.col("vec_id").alias("q_id"), "embedding")
    # argsort clamps probes at the cell count
    assert ivf_topk_from_index(spark, idx, q, k=3, probes=99).count() == 6
    assert ivf_topk_from_index(spark, idx, q.where(F.lit(False)), k=3, probes=2).count() == 0


def test_ivf_index_at_rest_matches_in_memory(spark, tmp_path):
    """The at-rest IVF index (centroids parquet + corpus partitioned by
    cell) returns byte-identical top-k to the in-session ivf_topk, and
    the corpus scan prunes to the probed cell partitions."""
    from json_remedy_spark.functions.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        write_ivf_index,
    )
    from json_remedy_spark.plans.explain import executed_plan

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")

    idx = str(tmp_path / "ivf")
    n_cells = write_ivf_index(e, idx, cells=8)
    assert n_cells >= 2

    mem = sorted(map(tuple, ivf_topk(e, q, k=5, cells=8, probes=3).collect()))
    stored_df = ivf_topk_from_index(spark, idx, q, k=5, probes=3)
    stored = sorted(map(tuple, stored_df.collect()))
    assert stored == mem and stored

    # the scan must carry a partition filter on cell (probed set only)
    plan = executed_plan(stored_df)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_append_equals_union_build(spark, tmp_path):
    """append_to_ivf_index's identical-results contract: building on
    half the corpus then appending the other half returns byte-equal
    top-k to a one-shot build over the union with the same centroids
    (assignment is a pure function of (vector, centroids) — only file
    layout differs).  Appended ids must be reachable in results."""
    from json_remedy_spark.functions.similarity import (
        append_to_ivf_index,
        ivf_topk_from_index,
        read_ivf_centroids,
        write_ivf_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    first, second = e.where("vec_id % 2 = 0"), e.where("vec_id % 2 = 1")
    q = e.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")

    grown = str(tmp_path / "ivf_grown")
    write_ivf_index(first, grown, cells=8)
    cen = read_ivf_centroids(spark, grown)
    n_cells = append_to_ivf_index(spark, grown, second)
    assert n_cells >= 2

    oneshot = str(tmp_path / "ivf_oneshot")
    write_ivf_index(e, oneshot, cells=8, centroids=cen)

    got = sorted(map(tuple, ivf_topk_from_index(spark, grown, q, k=5, probes=3).collect()))
    want = sorted(map(tuple, ivf_topk_from_index(spark, oneshot, q, k=5, probes=3).collect()))
    assert got == want and got
    # both halves are queryable: odd (appended) ids appear in the top-k
    assert any(vec_id % 2 == 1 for (_, vec_id, _, _) in got)
    # nothing lost or duplicated by the append
    total = spark.read.parquet(grown + "/vectors").count()
    assert total == e.count()
    assert spark.read.parquet(grown + "/vectors").select("vec_id").distinct().count() == total


def test_ivf_sq8_quantized_index(spark, tmp_path):
    """sq8 layout: codes binary + scale double (4x fewer bytes than
    float32), top-k within 1 rank-set of the full-precision index on
    clustered data, appends auto-quantize to match the stored layout."""
    from json_remedy_spark.functions.similarity import (
        append_to_ivf_index,
        ivf_topk_from_index,
        write_ivf_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")

    full, sq8 = str(tmp_path / "full"), str(tmp_path / "sq8")
    write_ivf_index(e, full, cells=8)
    write_ivf_index(e, sq8, cells=8, quantize="sq8")

    stored = spark.read.parquet(sq8 + "/vectors")
    assert {f.name for f in stored.schema.fields} == {"vec_id", "codes", "scale", "cell"}
    dims = len(e.select("embedding").first()[0])
    assert all(len(r["codes"]) == dims for r in stored.limit(5).collect())

    want = {(r["q_id"], r["vec_id"]) for r in ivf_topk_from_index(spark, full, q, k=5, probes=3).collect()}
    got = {(r["q_id"], r["vec_id"]) for r in ivf_topk_from_index(spark, sq8, q, k=5, probes=3).collect()}
    # int8 error is ~0.4% of the scale: neighbor SETS stay ~identical
    assert len(got & want) / len(want) >= 0.9

    n_before = stored.count()
    append_to_ivf_index(spark, sq8, e.limit(0))  # empty append keeps layout
    extra = e.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    append_to_ivf_index(spark, sq8, extra)
    after = spark.read.parquet(sq8 + "/vectors")
    assert "codes" in after.schema.fieldNames() and after.count() == 2 * n_before


def test_ivf_pq_quantized_index(spark, tmp_path):
    """PQ layout (Jégou et al. 2011): PQ_M one-byte codes per vector
    (64-dim float64: 512 B -> 8 B at rest, 64x) + per-subspace integer
    codebooks stored beside the centroids.  Checks: stored schema,
    numpy replay of the whole lossy path (quantize -> assign -> ADC
    cosine) matches the Spark scores bit-for-bit, ADC recall floor,
    rerank recovers near-full recall, appends auto-detect the layout."""
    import numpy as np

    from json_remedy_spark.functions.similarity import (
        PQ_FIXED_POINT,
        PQ_M,
        PQ_KSUB,
        append_to_ivf_index,
        ivf_topk_from_index,
        read_pq_codebooks,
        write_ivf_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.where(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")

    full, pq = str(tmp_path / "full"), str(tmp_path / "pq")
    write_ivf_index(e, full, cells=8)
    write_ivf_index(e, pq, cells=8, quantize="pq")

    stored = spark.read.parquet(pq + "/vectors")
    assert {f.name for f in stored.schema.fields} == {"vec_id", "codes", "cell"}
    assert all(len(r["codes"]) == PQ_M for r in stored.limit(5).collect())
    books = read_pq_codebooks(spark, pq)
    dims = len(e.select("embedding").first()[0])
    assert books.shape == (PQ_M, PQ_KSUB, dims // PQ_M)

    got_df = ivf_topk_from_index(spark, pq, q, k=5, probes=3)
    got_rows = got_df.collect()

    # independent numpy replay of quantize -> assign -> ADC cosine:
    # every returned cos must match the replay exactly (round 6)
    src = {r["vec_id"]: np.array(r["embedding"]) for r in e.collect()}
    dsub = dims // PQ_M

    def quant(x):
        s = max(np.abs(x).max(), 1e-30)
        return np.floor(x / s * PQ_FIXED_POINT + 0.5).astype(np.int64)

    def pq_cos(q_vec, v_vec):
        qi, xi = quant(q_vec), quant(v_vec)
        dot = r2 = 0
        for s in range(PQ_M):
            sub = xi[s * dsub : (s + 1) * dsub]
            code = int(np.argmin(((books[s] - sub) ** 2).sum(axis=1)))
            dot += int(books[s][code] @ qi[s * dsub : (s + 1) * dsub])
            r2 += int(books[s][code] @ books[s][code])
        q2 = int(qi @ qi)
        return round(dot / max(np.sqrt(float(r2)) * np.sqrt(float(q2)), 1e-30), 6)

    for r in got_rows:
        assert r["cos"] == pq_cos(src[r["q_id"]], src[r["vec_id"]]), r

    # recall floors: ADC-only is lossy but useful; rerank recovers it
    want = {(r["q_id"], r["vec_id"]) for r in ivf_topk_from_index(spark, full, q, k=5, probes=3).collect()}
    adc = {(r["q_id"], r["vec_id"]) for r in got_rows}
    assert len(adc & want) / len(want) >= 0.5
    reranked = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk_from_index(
            spark, pq, q, k=5, probes=3, rerank_from=e, rerank_factor=8
        ).collect()
    }
    assert len(reranked & want) / len(want) >= 0.9

    # appends auto-detect the pq layout from the stored schema
    n_before = stored.count()
    extra = e.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    append_to_ivf_index(spark, pq, extra)
    after = spark.read.parquet(pq + "/vectors")
    assert {f.name for f in after.schema.fields} == {"vec_id", "codes", "cell"}
    assert after.count() == 2 * n_before


def test_train_quality_classifier_learns_separation(spark, tmp_path):
    """In-engine NB training: weights trained on a labeled corpus make
    the production scorer separate held-out docs of the same
    distributions; the artifact round-trips through the ft_model
    format; the weight grid is complete (classes x FT_BUCKETS)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from json_remedy_spark.functions.classifier import (
        quality_classifier,
        train_quality_classifier,
    )
    from json_remedy_spark.functions.langid import FT_BUCKETS

    hi = "the study presents evidence and analysis of the method with results "
    lo = "click here to buy cheap offer win free bonus deal subscribe now "
    rows = [(i, "hi", hi * 3 + f"topic{i} ") for i in range(12)] + [
        (100 + i, "lo", lo * 3 + f"promo{i} ") for i in range(12)
    ]
    labeled = spark.createDataFrame(rows, ["doc_id", "label", "text"])
    w = train_quality_classifier(labeled)
    got = w.collect()
    assert len(got) == 2 * FT_BUCKETS
    assert all(r["weight"] < 0 for r in got)  # log-probs, quantized

    model = str(tmp_path / "qc.parquet")
    pq.write_table(
        pa.table(
            {
                "bucket": [r["bucket"] for r in got],
                "lang": [r["lang"] for r in got],
                "weight": [r["weight"] for r in got],
            }
        ),
        model,
    )
    held = spark.createDataFrame(
        [(1, hi + "fresh words about the research method"), (2, lo + "grab the deal now")],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r for r in quality_classifier(held, model_path=model).collect()}
    assert scored[1]["quality_label"] == "high" and scored[1]["margin"] > 0
    assert scored[2]["quality_label"] == "low" and scored[2]["margin"] < 0


def test_chunk_documents_windows(spark):
    """Fixed-token windows: disjoint + overlapping strides, trailing
    partial kept, empty/NULL docs yield nothing, reassembly covers
    every token exactly once at stride == chunk."""
    from json_remedy_spark.functions.corpus import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, None), (4, "   ")],
        ["doc_id", "text"],
    )
    got = sorted(map(tuple, chunk_documents(d, 3).collect()))
    assert got == [
        (1, 0, 3, "a b c"), (1, 1, 3, "d e f"), (1, 2, 1, "g"), (2, 0, 1, "x"),
    ]
    # disjoint chunks reassemble the doc exactly
    joined = " ".join(t for (_, _, _, t) in got[:3])
    assert joined == "a b c d e f g"
    # overlapping: stride 2 windows share a token with their neighbor
    ov = sorted(map(tuple, chunk_documents(d, 3, stride=2).where("doc_id = 1").collect()))
    assert [t for (_, _, _, t) in ov] == ["a b c", "c d e", "e f g", "g"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(d, 0)


def test_pack_sequences_exact_boundaries(spark):
    """Sequence packing: every sequence except possibly the last has
    exactly seq_tokens tokens, docs split across boundaries, pieces
    per doc reassemble the doc, empty/NULL docs contribute nothing."""
    from collections import defaultdict

    from json_remedy_spark.functions.corpus import pack_sequences

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g"), (3, None), (4, "h i j k l m n o"), (5, "p")],
        ["doc_id", "text"],
    )
    got = sorted(map(tuple, pack_sequences(d, 4).collect()))
    totals = defaultdict(int)
    for sid, _, _, n, _ in got:
        totals[sid] += n
    sids = sorted(totals)
    assert all(totals[s] == 4 for s in sids[:-1]) and totals[sids[-1]] <= 4
    # doc 4 spans three sequences and reassembles in (seq, pos) order
    d4 = [t for t in got if t[1] == 4]
    assert len(d4) == 3
    assert " ".join(x[4] for x in sorted(d4)) == "h i j k l m n o"
    # pos_in_seq is consistent: pieces within a sequence tile it
    by_seq = defaultdict(list)
    for sid, _, pos, n, _ in got:
        by_seq[sid].append((pos, n))
    for sid, pieces in by_seq.items():
        pieces.sort()
        cur = 0
        for pos, n in pieces:
            assert pos == cur
            cur += n
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(d, 0)


def test_chunk_pack_randomized_invariants(spark):
    """Seeded random corpus, structural invariants for the loader
    primitives across parameter combos:
      - chunking at stride==chunk conserves and reassembles tokens;
      - overlapping chunks each start stride tokens apart;
      - packing conserves total tokens, tiles every sequence, and
        reassembles every doc."""
    import random

    from json_remedy_spark.functions.corpus import chunk_documents, pack_sequences

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))))
        for i in range(30)
    ] + [(98, None), (99, "")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    n_tokens = {i: len(t.split()) for i, t in rows[:30]}

    for chunk, stride in [(5, 5), (7, 3), (1, 1), (64, 64)]:
        got = chunk_documents(d, chunk, stride=stride).collect()
        per_doc = {}
        for r in got:
            per_doc.setdefault(r["doc_id"], []).append(r)
        assert set(per_doc) == set(n_tokens)
        for did, chunks in per_doc.items():
            chunks.sort(key=lambda r: r["chunk_id"])
            n = n_tokens[did]
            assert len(chunks) == -(-n // stride)  # ceil
            for j, c in enumerate(chunks):
                start = j * stride
                assert c["n_tokens"] == min(chunk, n - start)
                assert c["n_tokens"] == len(c["text"].split())
            if stride == chunk:  # disjoint: exact reassembly
                joined = " ".join(c["text"] for c in chunks)
                assert joined == dict(rows[:30])[did]

    for seq in (4, 17, 1000):
        got = pack_sequences(d, seq).collect()
        assert sum(r["n_tokens"] for r in got) == sum(n_tokens.values())
        by_seq = {}
        for r in got:
            by_seq.setdefault(r["seq_id"], []).append((r["pos_in_seq"], r["n_tokens"]))
        sids = sorted(by_seq)
        for sid in sids:
            cur = 0
            for pos, n in sorted(by_seq[sid]):
                assert pos == cur
                cur += n
            assert cur == seq or sid == sids[-1]
        per_doc = {}
        for r in got:
            per_doc.setdefault(r["doc_id"], []).append((r["seq_id"], r["pos_in_seq"], r["text"]))
        for did, pieces in per_doc.items():
            assert " ".join(t for (_, _, t) in sorted(pieces)) == dict(rows[:30])[did]


def test_pack_token_ids_placement(spark):
    """Packing an encoded stream: every sequence except the last holds
    exactly seq_tokens ids, stream order follows (doc_id, pos), and
    ids survive placement unchanged."""
    from json_remedy_spark.functions.corpus import pack_token_ids

    rows = [(d, p, d * 100 + p) for d, n in [(1, 5), (2, 2), (4, 9)] for p in range(n)]
    enc = spark.createDataFrame(rows, ["doc_id", "pos", "token_id"])
    got = sorted(
        map(tuple, pack_token_ids(enc, 4).collect())
    )  # (seq_id, pos_in_seq, doc_id, token_id)
    assert len(got) == 16
    stream = [t[3] for t in sorted(got, key=lambda t: (t[0], t[1]))]
    want = [r[2] for r in sorted(rows)]
    assert stream == want
    from collections import Counter

    sizes = Counter(t[0] for t in got)
    assert sizes == {0: 4, 1: 4, 2: 4, 3: 4}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_token_ids(enc, 0)


def test_url_features_known_values(spark):
    """Handcrafted urls with known feature values (ports, tilde-user
    homepages, query strings, digit-heavy spam paths)."""
    from json_remedy_spark.functions.webgraph import url_features

    rows = [
        (1, "https://www.example.com/"),
        (2, "https://a.b.c.example.com:8080/~joe/page?x=1&y=2&z=3"),
        (3, "http://spam123.biz/91/82/73abc"),
        (4, "https://example.com"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["doc_id"]: r.asDict() for r in url_features(d).collect()}
    assert got[1]["path_depth"] == 0 and got[1]["host"] == "www.example.com"
    assert not got[1]["has_port"] and got[1]["n_query_params"] == 0
    r2 = got[2]
    assert r2["has_port"] and r2["tilde_user"] and r2["n_query_params"] == 3
    assert r2["path_depth"] == 2 and r2["n_subdomains"] == 4
    r3 = got[3]
    assert r3["host_digit_frac"] > 0.2 and r3["digit_frac"] >= 0.5  # '/91/82/73abc' = 6 digits / 12 chars
    assert got[4]["path_depth"] == 0 and got[4]["path_len"] == 1  # bare authority -> '/'


def test_bm25_topk_ranking_and_stopword_cap(spark):
    """Known ordering: more query-term hits rank higher, rare terms
    out-pull common ones, and terms above the df cap (stopword-grade)
    contribute nothing — the skew guard that keeps 'the' from routing
    the corpus through one join key."""
    from json_remedy_spark.functions.search import bm25_topk

    rows = [
        (1, "the volcano erupted with ash the the"),
        (2, "the volcano is dormant"),
        (3, "ash fell on the town near the volcano and more ash came"),
        (4, "an unrelated text about rivers the"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    q = spark.createDataFrame([(0, "volcano ash")], ["q_id", "query"])

    # cap 0.9: past 'the' (df 4/4) but under 'volcano' (df 3/4 — a
    # 4-doc corpus makes every real term look stopword-grade at 0.5)
    got = bm25_topk(docs, q, k=4, max_df_frac=0.9).orderBy("rank").collect()
    order = [r["doc_id"] for r in got]
    # docs 1 and 3 hit both terms, 2 only 'volcano', 4 neither
    assert set(order[:2]) == {1, 3} and order[2] == 2 and 4 not in order
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(got[i]["score"] >= got[i + 1]["score"] for i in range(len(got) - 1))

    # 'the' (df 4/4) is over every sensible cap: a query of only
    # stopword-grade terms matches nothing
    the_q = spark.createDataFrame([(0, "the")], ["q_id", "query"])
    assert bm25_topk(docs, the_q, k=4, max_df_frac=0.9).count() == 0


def test_bm25_postings_table_matches_in_session(spark, tmp_path):
    """The at-rest postings table (term-bucketed partitions + stats +
    df sidecars) returns byte-identical top-k to the in-session
    bm25_topk, and the postings scan prunes to the query-term
    buckets."""
    from json_remedy_spark.functions.search import (
        bm25_topk,
        bm25_topk_from_postings,
        write_postings_table,
    )
    from json_remedy_spark.plans.explain import executed_plan

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame(
        [(0, "hash join merge"), (1, "slow vector scan")], ["q_id", "query"]
    )
    idx = str(tmp_path / "postings")
    n = write_postings_table(d, idx, n_buckets=16, max_df_frac=1.0)
    assert 2 <= n <= 16

    mem = sorted(map(tuple, bm25_topk(d, q, k=5, max_df_frac=1.0).collect()))
    stored_df = bm25_topk_from_postings(spark, idx, q, k=5, n_buckets=16)
    stored = sorted(map(tuple, stored_df.collect()))
    assert stored == mem and stored

    plan = executed_plan(stored_df)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_soft_dedup_weights_cluster_mass(spark):
    """SoftDeDup contract: at exponent=1 every cluster's total weight
    is exactly the hard-dedup mass (1.0), singletons keep weight 1.0,
    and no document is dropped."""
    from json_remedy_spark.functions.dedup import soft_dedup_weights

    dup = "the same boilerplate paragraph repeated across mirrors " * 6
    rows = [(1, dup), (2, dup + "x"), (3, dup + "y"), (10, "a genuinely unique document about volcanoes")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = soft_dedup_weights(docs, threshold=0.5).collect()
    assert {r["doc_id"] for r in got} == {1, 2, 3, 10}
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[10]["cluster_size"] == 1 and by_id[10]["weight"] == 1.0
    assert by_id[1]["cluster_size"] == 3
    mass = sum(r["weight"] for r in got if r["rep_id"] == by_id[1]["rep_id"])
    assert abs(mass - 1.0) < 1e-5
    # exponent 0 = no dedup (all weights 1); exponent 0.5 interpolates
    half = {r["doc_id"]: r["weight"] for r in soft_dedup_weights(docs, threshold=0.5, exponent=0.5).collect()}
    assert half[10] == 1.0 and 1.0 / 3 < half[1] < 1.0


def test_components_with_full_range_hash_ids(spark):
    """doc ids from xxhash64 are full-range 64-bit: the convergence
    sum must not overflow BIGINT (runs in DECIMAL(38,0))."""
    from json_remedy_spark.functions.dedup import components_from_pairs

    big = [9_223_372_036_854_775_000 - i for i in range(6)]  # near Long.MAX
    ids = spark.createDataFrame([(i,) for i in big], ["doc_id"])
    pairs = spark.createDataFrame([(big[1], big[0]), (big[3], big[2])], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["rep_id"] for r in components_from_pairs(ids, pairs).collect()}
    assert got[big[0]] == got[big[1]] == min(big[0], big[1])
    assert got[big[2]] == got[big[3]] == min(big[2], big[3])
    assert got[big[4]] == big[4] and got[big[5]] == big[5]


def test_components_match_python_union_find(spark):
    """Randomized cross-check: label propagation == brute union-find."""
    import random

    from json_remedy_spark.functions.dedup import components_from_pairs

    rng = random.Random(7)
    for _ in range(3):
        n = 30
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(18)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {i: find(i) for i in range(n)}

        ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        got = {r["doc_id"]: r["rep_id"] for r in components_from_pairs(ids, pairs).collect()}
        assert got == expected


def test_extended_gopher_c4_rules(spark):
    from json_remedy_spark.functions import quality

    rows = [
        (0, "- a\n- b\n- c"),  # all bullet lines
        (1, "line one...\nline two…\nplain line"),  # 2/3 ellipsis ends
        (2, "abc 123 456 x9"),  # alpha words 2/4
        (3, "Some Lorem Ipsum filler"),
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    t = F.col("text")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            F.round(quality.bullet_line_ratio(t), 4).alias("b"),
            F.round(quality.ellipsis_line_ratio(t), 4).alias("e"),
            F.round(quality.alpha_word_ratio(t), 4).alias("a"),
            quality.has_lorem_ipsum(t).alias("l"),
        ).collect()
    }
    assert got[0]["b"] == 1.0
    assert got[1]["e"] == round(2 / 3, 4)
    assert got[2]["a"] == 0.5
    assert got[3]["l"] is True and got[0]["l"] is False


def test_canonical_url_semantics(spark):
    from json_remedy_spark.functions.corpus import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/X?utm_source=a&id=5&utm_medium=b#frag",
         "https://www.example.com/Path/X?id=5"),
        ("HTTP://Host.org:80/x", "http://host.org/x"),
        ("https://host.org:8080/x", "https://host.org:8080/x"),  # non-default port kept
        ("https://h.io/p?fbclid=abc", "https://h.io/p"),
        ("https://h.io/p?id=1&gclid=abc", "https://h.io/p?id=1"),
        ("relative/path#frag", "relative/path"),  # no scheme -> case untouched
        ("https://h.io/CaseKept/Path", "https://h.io/CaseKept/Path"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"])
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, exp) in enumerate(cases):
        assert got[i] == exp, f"{u!r}: got {got[i]!r}, want {exp!r}"


def test_stratified_sample_deterministic(spark):
    from json_remedy_spark.functions.corpus import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"] for r in stratified_sample(docs, 10).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, 10).collect()}
    assert a == b and a  # identical across runs, non-empty
    assert len(a) / docs.count() < 0.25  # ~10% of 500, generous bound
    sub = {r["doc_id"] for r in stratified_sample(docs, 5).collect()}
    assert sub <= a  # nested rates: 5% bucket set is a subset of 10%


def test_dedup_job_stored_path_matches_in_memory(spark, tmp_path):
    """The production job's composition (at-rest signatures -> stored
    candidates -> verify -> components) must equal the in-memory
    near_dup_components on the same corpus."""
    from json_remedy_spark.functions.dedup import (
        components_from_pairs,
        jaccard_verify_candidates,
        lsh_candidate_pairs_from_table,
        near_dup_components,
        shingles,
        write_signature_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    sig_dir = str(tmp_path / "sig")
    write_signature_table(docs, sig_dir, n_buckets=4)
    cand = lsh_candidate_pairs_from_table(spark, sig_dir).persist()
    sh = shingles(docs).persist()
    verified = jaccard_verify_candidates(sh, cand, threshold=0.5)
    stored = {
        (r["doc_id"], r["rep_id"], r["is_canonical"])
        for r in components_from_pairs(docs.select("doc_id"), verified).collect()
    }
    mem = {
        (r["doc_id"], r["rep_id"], r["is_canonical"])
        for r in near_dup_components(docs, threshold=0.5).collect()
    }
    assert stored == mem and any(not c for _, _, c in stored)  # some dups exist


def test_jaccard_verify_driver_fast_path_parity(spark):
    """r07: the small-candidate-set driver fast path (bounded Arrow
    collect + Python set intersections + the SAME Spark round/division
    expression over a LocalTableScan) must be row- and value-identical
    to the distributed join form, including schema, the
    no-common-shingle drop, and the threshold filter."""
    from json_remedy_spark.functions.dedup import (
        banded_signatures,
        candidate_pairs_from_banded,
        jaccard_verify_candidates,
        minhash_from_shingles,
        shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    sh = shingles(docs).persist()
    cand = candidate_pairs_from_banded(
        banded_signatures(minhash_from_shingles(sh))
    ).persist()
    fast_df = jaccard_verify_candidates(sh, cand, threshold=0.5)
    slow_df = jaccard_verify_candidates(sh, cand, threshold=0.5, collect_max_pairs=0)
    assert [f.name for f in fast_df.schema.fields] == [
        f.name for f in slow_df.schema.fields
    ]
    assert [f.dataType for f in fast_df.schema.fields] == [
        f.dataType for f in slow_df.schema.fields
    ]
    fast = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in fast_df.collect()}
    slow = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in slow_df.collect()}
    assert fast == slow and fast  # exact values incl. rounding, non-empty
    sh.unpersist()
    cand.unpersist()


def test_soft_dedup_sizes_from_driver_labels_parity(spark):
    """r07: when the components fast path runs, soft_dedup_weights
    joins a broadcast LOCAL size table built from the union-find's
    driver labels instead of the corpus-wide groupBy + join-back.
    Same rows as the star-algorithm run (which keeps the groupBy
    path), including singleton weight 1.0."""
    from json_remedy_spark.functions.dedup import soft_dedup_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    fast = {
        (r["doc_id"], r["rep_id"], r["cluster_size"], r["weight"])
        for r in soft_dedup_weights(docs, threshold=0.5).collect()
    }
    slow = {
        (r["doc_id"], r["rep_id"], r["cluster_size"], r["weight"])
        for r in soft_dedup_weights(docs, threshold=0.5, algorithm="star").collect()
    }
    assert fast == slow and fast
    assert any(sz > 1 for _, _, sz, _ in fast)  # real clusters present
    assert any(sz == 1 for _, _, sz, _ in fast)  # singletons present


def test_fuzzy_decontaminate_driver_fast_path_parity(spark):
    """r07: fuzzy_decontaminate's bounded-candidate driver fast path
    must equal the distributed bipartite join form exactly (schema,
    values, rounding)."""
    from json_remedy_spark.functions.dedup import fuzzy_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    corp = docs.where("doc_id % 20 <> 0")
    ev = docs.where("doc_id % 20 = 0")
    fast_df = fuzzy_decontaminate(corp, ev, threshold=0.5)
    slow_df = fuzzy_decontaminate(corp, ev, threshold=0.5, collect_max_pairs=0)
    assert [(f.name, f.dataType) for f in fast_df.schema.fields] == [
        (f.name, f.dataType) for f in slow_df.schema.fields
    ]
    fast = {(r["doc_id"], r["eval_id"]): r["jaccard"] for r in fast_df.collect()}
    slow = {(r["doc_id"], r["eval_id"]): r["jaccard"] for r in slow_df.collect()}
    assert fast == slow and fast  # exact values incl. rounding, non-empty


def test_components_transitive_closure(spark):
    """a~b and b~c put a,b,c in ONE component even when a!~c directly;
    singletons keep themselves; min doc_id is canonical."""
    from json_remedy_spark.functions.dedup import components_from_pairs

    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    # chain 0-1-2, pair 4-5, singleton 3
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: (r["rep_id"], r["is_canonical"]) for r in components_from_pairs(ids, pairs).collect()}
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True), 5: (4, False),
    }


def test_components_long_chain_converges(spark):
    """A 12-node path graph needs ~diameter rounds — must converge, not
    hit the max_iters guard.  collect_max_pairs=0 forces the
    DISTRIBUTED loop (the r07 small-graph fast path would otherwise
    absorb a graph this size)."""
    from json_remedy_spark.functions.dedup import components_from_pairs

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    rows = components_from_pairs(
        ids, pairs, max_iters=n + 2, collect_max_pairs=0
    ).collect()
    assert all(r["rep_id"] == 0 for r in rows) and len(rows) == n


def test_components_driver_fast_path_parity_and_routing(spark):
    """r07: small pair graphs label via ONE driver union-find; output
    must equal the distributed min-label loop exactly, the stats hook
    must say which path ran, and collect_max_pairs must route."""
    import random

    from json_remedy_spark.functions.dedup import components_from_pairs

    rng = random.Random(41)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])

    fast_stats, loop_stats = {}, {}
    fast = sorted(
        tuple(r)
        for r in components_from_pairs(ids, pairs, stats_out=fast_stats).collect()
    )
    loop = sorted(
        tuple(r)
        for r in components_from_pairs(
            ids, pairs, stats_out=loop_stats, collect_max_pairs=0
        ).collect()
    )
    assert fast == loop
    assert fast_stats.get("driver_union_find") and fast_stats["rounds"] == 0
    assert "driver_union_find" not in loop_stats and loop_stats["rounds"] >= 1


def test_star_components_match_min_label(spark):
    """algorithm='star' (large-star/small-star, Kiveris et al.) is an
    exact drop-in for min-label: identical labeling on chains, cliques,
    mismatched closers, and singletons."""
    from json_remedy_spark.functions.dedup import components_from_pairs

    ids = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    # chain 0..9, clique 10..14, pair (20,21), star 30<-{31,32,33}, rest singleton
    edges = (
        [(i, i + 1) for i in range(9)]
        + [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(20, 21), (31, 30), (32, 30), (33, 30)]
    )
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])

    def rows(alg):
        return sorted(
            tuple(r)
            for r in components_from_pairs(ids, pairs, algorithm=alg).collect()
        )

    min_label, star = rows("min_label"), rows("star")
    assert star == min_label
    got = dict((d, r) for d, r, _ in star)
    assert got[9] == 0 and got[14] == 10 and got[33] == 30 and got[25] == 25


def test_star_components_log_rounds_on_long_chain(spark):
    """The point of the escape hatch: a 64-node path converges within
    ~2*log2(n) alternating rounds, far under the diameter."""
    from json_remedy_spark.functions.dedup import components_from_pairs

    n = 64
    ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    # min_label would need ~63 rounds; star must land well inside 14
    rows = components_from_pairs(ids, pairs, max_iters=14, algorithm="star").collect()
    assert all(r["rep_id"] == 0 for r in rows) and len(rows) == n


def test_star_components_random_graph_parity(spark):
    """Seeded random graphs (mixed densities, isolated nodes, self
    loops, duplicate/reversed edges) — star and min-label must agree
    exactly on every one."""
    import random

    from json_remedy_spark.functions.dedup import components_from_pairs

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 50
        ids = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        edges = [
            (rng.randrange(n), rng.randrange(n))  # self loops included
            for _ in range(rng.randrange(10, 70))
        ]
        edges += [(b, a) for a, b in edges[:5]]  # reversed duplicates
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        a = sorted(tuple(r) for r in components_from_pairs(ids, pairs, max_iters=60).collect())
        b = sorted(
            tuple(r)
            for r in components_from_pairs(ids, pairs, algorithm="star").collect()
        )
        assert a == b, f"seed {seed} diverged"


def test_star_components_on_lsh_pair_graph(spark):
    """Parity on the real LSH->jaccard pair graph over the sf0.001
    documents table — the dedup_components oracle inputs, through both
    algorithms (VERDICT r3 #9)."""
    from json_remedy_spark.functions.dedup import near_dup_components

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a = sorted(tuple(r) for r in near_dup_components(docs, threshold=0.5).collect())
    b = sorted(
        tuple(r)
        for r in near_dup_components(docs, threshold=0.5, algorithm="star").collect()
    )
    assert a == b and any(not c for _, _, c in a)


def test_near_dup_components_end_to_end(spark, docs):
    from json_remedy_spark.functions.dedup import near_dup_components

    got = {r["doc_id"]: r["rep_id"] for r in near_dup_components(docs, threshold=0.5).collect()}
    # docs 0,1,4 identical, 2 near-dup of them, 3 unrelated
    assert got[0] == got[1] == got[2] == got[4] == 0
    assert got[3] == 3


def test_near_dup_components_hub_cap_threaded(spark):
    """hub_cap threads through near_dup_components (the corpus
    pipeline's s5 guard): a cap above every bucket reproduces the
    exact labeling bit-for-bit, and an identical-text family larger
    than the cap still fully collapses via its verified star edges
    (every member pairs with the min-id hub at jaccard 1)."""
    from json_remedy_spark.functions.dedup import near_dup_components

    fam = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, fam) for i in range(8)] + [
        (100, "completely unrelated text about arrow batches and shuffles")
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = sorted(tuple(r) for r in near_dup_components(docs, threshold=0.8).collect())
    high = sorted(
        tuple(r)
        for r in near_dup_components(docs, threshold=0.8, hub_cap=1000).collect()
    )
    assert high == exact

    capped = {
        r["doc_id"]: r["rep_id"]
        for r in near_dup_components(
            docs, threshold=0.8, hub_cap=3, n_hubs=1
        ).collect()
    }
    assert all(capped[i] == 0 for i in range(8)) and capped[100] == 100


def test_incremental_near_dup_components_parity_and_bridge(spark):
    """Dump-over-dump fuzzy dedup equals the one-shot union labeling,
    including the hard case: a NEW doc bridging TWO previously-separate
    old clusters (the merge must happen without re-verifying any
    (seen x seen) pair — connectivity flows through the prior star
    edges).  Also pins the kernel-cost contract: old docs without a
    candidate pair never reach the shingle stage."""
    from json_remedy_spark.functions.dedup import (
        banded_signatures,
        incremental_near_dup_components,
        minhash_signatures,
        near_dup_components,
    )

    base = (
        "shared boilerplate sentence about data pipelines and spark "
        "execution that makes up most of every document body here"
    )
    old_rows = [
        (0, base + " alpha variant"),
        (1, base + " alpha variant"),          # cluster {0,1}
        (10, base + " omega variant"),
        (11, base + " omega variant"),         # cluster {10,11}
        (20, "totally unrelated text on parquet footers and row groups"),
    ]
    new_rows = [
        (30, base),                             # bridges both clusters
        (31, "fresh unique document about watermarks and state stores"),
        (32, base + " alpha variant"),          # joins cluster {0,1}
    ]
    old = spark.createDataFrame(old_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    seen_banded = banded_signatures(minhash_signatures(old))
    seen_comp = near_dup_components(old, threshold=0.5)
    got = {
        r["doc_id"]: (r["rep_id"], r["is_canonical"])
        for r in incremental_near_dup_components(
            new, seen_banded, old, seen_comp, threshold=0.5
        ).collect()
    }
    want = {
        r["doc_id"]: (r["rep_id"], r["is_canonical"])
        for r in near_dup_components(old.unionByName(new), threshold=0.5).collect()
    }
    assert got == want
    # the bridge merged {0,1}, {10,11}, 30 and 32 into one rep-0 cluster
    assert {got[i][0] for i in (0, 1, 10, 11, 30, 32)} == {0}
    assert got[20] == (20, True) and got[31] == (31, True)

    # r07: the seen_shingles reuse path (matched old docs read their
    # rows from an already-materialized shingle table instead of
    # re-running the kernel) is row-identical
    from json_remedy_spark.functions.dedup import shingles

    sh_seen = shingles(old).persist()
    got_reuse = {
        r["doc_id"]: (r["rep_id"], r["is_canonical"])
        for r in incremental_near_dup_components(
            new, seen_banded, old, seen_comp, threshold=0.5, seen_shingles=sh_seen
        ).collect()
    }
    sh_seen.unpersist()
    assert got_reuse == want


def test_stateful_stream_lsh_near_dup(spark, tmp_path):
    """Streaming minhash-LSH: band-bucket state emits candidate pairs
    against the bucket representative, across micro-batches and a
    restart; candidates match the batch LSH operator's verdicts."""
    from json_remedy_spark.streaming.stateful_lsh import run_once

    in_dir = tmp_path / "lin"
    in_dir.mkdir()
    out = str(tmp_path / "lout")
    ckpt = str(tmp_path / "lckpt")
    base = "the quick brown fox jumps over the lazy dog"
    near = "the quick brown fox jumps over the sleepy dog"
    other = "completely different text about spark pipelines and arrow batches"

    spark.createDataFrame([(0, base), (3, other)], ["doc_id", "text"]).coalesce(1).write.parquet(
        str(in_dir / "batch1")
    )
    run_once(spark, str(in_dir) + "/*", out, ckpt)
    assert spark.read.parquet(out).count() == 0  # first occurrences: no pairs

    # restart with new files: an exact dup and a near dup of doc 0
    spark.createDataFrame([(10, base), (11, near)], ["doc_id", "text"]).coalesce(1).write.parquet(
        str(in_dir / "batch2")
    )
    run_once(spark, str(in_dir) + "/*", out, ckpt)
    pairs = {
        (r["doc_id"], r["rep_doc_id"])
        for r in spark.read.parquet(out).dropDuplicates(["doc_id", "rep_doc_id"]).collect()
    }
    assert (10, 0) in pairs  # exact dup collides in every band
    assert (11, 0) in pairs  # near dup collides in >=1 band (batch parity)
    assert not any(r in pairs for r in [(3, 0), (0, 3)])


def test_stream_lsh_ttl_wiring(spark, tmp_path):
    """TTL-enabled variant runs under a real processing-time trigger
    (its production mode — availableNow cannot terminate with pending
    processing-time timeouts, see stateful_lsh docstring) and must not
    change within-window semantics."""
    import glob
    import time

    from json_remedy_spark.streaming.stateful_lsh import stream_lsh_near_dup

    in_dir = tmp_path / "tin"
    in_dir.mkdir()
    spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f"), (2, "unrelated words entirely here")],
        ["doc_id", "text"],
    ).coalesce(1).write.parquet(str(in_dir / "b1"))
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    docs = spark.readStream.schema(schema).parquet(str(in_dir) + "/*")
    q = (
        stream_lsh_near_dup(docs, ttl_minutes=60)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "tout"))
        .option("checkpointLocation", str(tmp_path / "tck"))
        .trigger(processingTime="1 second")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if (
                    glob.glob(str(tmp_path / "tout" / "*.parquet"))
                    and spark.read.parquet(str(tmp_path / "tout")).count() >= 1
                ):
                    break
            except Exception:  # sink file visible before its commit
                pass
            time.sleep(1)
    finally:
        q.stop()
    pairs = {
        (r["doc_id"], r["rep_doc_id"])
        for r in spark.read.parquet(str(tmp_path / "tout"))
        .dropDuplicates(["doc_id", "rep_doc_id"])
        .collect()
    }
    assert pairs == {(1, 0)}


def test_simhash_near_dup_bands(spark, docs):
    """Hamming-band join: exact dups at hamming 0, the near-dup pair
    within <= 3 bits; pigeonhole recall is exact at max_hamming=3."""
    from json_remedy_spark.functions.dedup import simhash_near_dup

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dup(docs).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0 and pairs[(1, 4)] == 0
    assert all(h <= 3 for h in pairs.values())
    # brute-force cross-check: every hamming<=3 pair is found
    from json_remedy_spark.functions.dedup import simhash

    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    mask64 = (1 << 64) - 1
    expect = {
        (a, b)
        for a in fp
        for b in fp
        if a < b and bin((fp[a] ^ fp[b]) & mask64).count("1") <= 3
    }
    assert set(pairs) == expect


def test_simhash_pigeonhole_exact_recall(spark):
    """Planted <=3-bit flips (including in the sign-carrying top band)
    must ALL surface: 4 x 16-bit bands + pigeonhole => exact recall at
    max_hamming = 3."""
    import hashlib

    from json_remedy_spark.functions.dedup import (
        _signed64,
        simhash_near_dup_from_fingerprints,
    )

    rng_bits = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
    rows, expect = [], set()
    for i in range(200):
        base = rng_bits(f"base-{i}")
        rows.append((2 * i, _signed64(base)))
        # flip 1-3 bits, biased to cover every band incl. bit 63
        flips = [(rng_bits(f"flip-{i}-{j}") % 64) for j in range(1 + i % 3)]
        if i % 7 == 0:
            flips[0] = 63
        part = base
        for f in set(flips):
            part ^= 1 << f
        rows.append((2 * i + 1, _signed64(part)))
        if part != base:
            expect.add((2 * i, 2 * i + 1))
    fp = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_from_fingerprints(fp, max_hamming=3).collect()
    }
    assert expect <= got  # exact recall: every planted pair found
    # verification is exact too: nothing beyond hamming<=3 sneaks in
    by_id = dict(rows)
    mask64 = (1 << 64) - 1
    for a, b in got:
        assert bin((by_id[a] ^ by_id[b]) & mask64).count("1") <= 3


def test_simhash_max_hamming_guard(spark, docs):
    """max_hamming >= SIMHASH_BANDS would silently lose recall — the
    exact-recall contract is enforced (ADVICE r2)."""
    from json_remedy_spark.functions.dedup import simhash_near_dup

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup(docs, max_hamming=4)


def test_simhash_band_selectivity_vs_8bit(spark):
    """Candidate volume: 16-bit chunks of a 64-bit fingerprint vs the
    old 8-bit chunks of its low 32 bits, on 50k uniform fingerprints.
    Expected ratio is 65536/256 = 256x fewer candidate pairs; assert a
    conservative 200x (the sum over 4x65536 blocks concentrates to
    within ~1%)."""
    fp = spark.range(50_000).select(F.xxhash64(F.col("id")).alias("simhash"))

    def pair_count(chunk_bits, n_bands):
        mask = (1 << chunk_bits) - 1
        chunks = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), chunk_bits * b)
                    .bitwiseAND(F.lit(mask))
                    .alias("chunk"),
                )
                for b in range(n_bands)
            ]
        )
        blocks = (
            fp.select(F.explode(chunks).alias("bc"))
            .groupBy("bc.band", "bc.chunk")
            .agg(F.count("*").alias("n"))
        )
        return blocks.agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs")
        ).collect()[0]["pairs"]

    old = pair_count(8, 4)   # round-2 layout: 4 x 8-bit chunks
    new = pair_count(16, 4)  # 4 x 16-bit chunks (Manku-style)
    assert new > 0  # 50k docs into 4*65536 blocks still collide
    assert old / new >= 200, f"selectivity ratio only {old / new:.0f}x"


def test_lsh_plane_count_shrinks_buckets(spark):
    """More planes => smaller bucket blocks (selectivity knob): the max
    and mean bucket occupancy with 12 planes must be below the 8-plane
    occupancy on the same vectors."""
    from json_remedy_spark.functions.similarity import with_lsh_bucket

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )

    def occupancy(n_planes):
        counts = (
            with_lsh_bucket(emb, n_planes=n_planes)
            .groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .agg(F.max("n").alias("mx"), F.avg("n").alias("avg"))
            .collect()[0]
        )
        return counts["mx"], counts["avg"]

    mx8, avg8 = occupancy(8)
    mx12, avg12 = occupancy(12)
    assert mx12 < mx8 and avg12 < avg8


def test_recommended_planes_log_scaled():
    from json_remedy_spark.functions.similarity import recommended_planes

    assert recommended_planes(100) == 8          # sandbox floor
    assert recommended_planes(1_000_000) == 20
    assert recommended_planes(10**9) == 30


def test_cosine_topk_rejects_string_ids(spark):
    """String ids would silently become NULL under the long cast —
    the contract fails fast instead (ADVICE r2)."""
    from json_remedy_spark.functions.similarity import cosine_topk

    vecs = spark.createDataFrame([("a", [1.0, 0.0])], ["vec_id", "embedding"])
    q = spark.createDataFrame([(1, [1.0, 0.0])], ["q_id", "embedding"])
    with pytest.raises(TypeError, match="integer type"):
        cosine_topk(vecs, q, k=1)


def test_embedding_near_dup_plane_default_and_parity(spark):
    """The log2(N)-scaled default must still find the pairs the exact
    verifier finds at a high threshold (identical-ish vectors collide
    in every table)."""
    from json_remedy_spark.functions.similarity import (
        cosine_pairs_exact,
        embedding_near_dup,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") < 300)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    exact = {(r["id_a"], r["id_b"]) for r in cosine_pairs_exact(emb, threshold=0.99).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_near_dup(emb, threshold=0.99).collect()}
    assert lsh <= exact  # never invents pairs
    if exact:
        assert len(lsh) / len(exact) >= 0.5  # OR-amplified recall at cos>=0.99


def test_lsh_verified_pairs_subset_of_exact(spark, docs):
    """Fused LSH->jaccard must agree with exact jaccard on every pair
    it emits (LSH may miss pairs, never invent or mis-score them)."""
    from json_remedy_spark.functions.dedup import jaccard_pairs, lsh_verified_pairs

    fused = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in lsh_verified_pairs(docs, threshold=0.5).collect()}
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert fused, "expected at least the exact-dup pairs"
    for pair, j in fused.items():
        assert exact[pair] == j


def test_lsh_candidates_single_signature_materialization(spark, docs):
    """The band self-join must read ONE persisted signature
    materialization (InMemoryRelation on both sides), not recompute
    the minhash MapInPandas kernel per side."""
    from json_remedy_spark.functions.dedup import lsh_candidate_pairs
    from json_remedy_spark.plans.explain import executed_plan

    plan = executed_plan(lsh_candidate_pairs(docs))
    # both join children scan the cache (InMemoryRelation prints its
    # build plan under each scan, so MapInPandas appears textually —
    # what matters is that BOTH sides are InMemoryTableScan)
    assert plan.count("InMemoryTableScan") >= 2


def test_catalog_adapter_falls_back_without_iceberg(spark, tmp_path):
    """No Iceberg runtime in this sandbox -> the adapter must detect
    that and commit via the parquet+manifest protocol with identical
    visibility semantics."""
    from json_remedy_spark.operators.checkpoint import committed_buckets
    from json_remedy_spark.sources.catalog import iceberg_available, write_bucketed_table

    assert iceberg_available(spark) is False
    df = spark.createDataFrame([(f"u{i}", i) for i in range(40)], ["url", "v"])
    out = str(tmp_path / "tbl")
    fmt = write_bucketed_table(df, "jrs.db.tbl", out, n_buckets=4)
    assert fmt == "parquet+manifest"
    assert committed_buckets(out) == {0, 1, 2, 3}
    assert spark.read.parquet(out + "/part_bucket=*").count() == 40


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    """The full quality-filter DAG must produce identical rows when run
    as a stream (availableNow) and as a batch over the same pages."""
    from json_remedy_spark.operators.pipeline import quality_filter
    from json_remedy_spark.sources.webpages import synthesize_corpus
    from json_remedy_spark.streaming.stream_repair import run_quality_filter_stream

    docs, _ = synthesize_corpus(spark, 200, partitions=2)
    src = str(tmp_path / "pages")
    docs.write.parquet(src)

    out = str(tmp_path / "stream_out")
    run_quality_filter_stream(spark, src, out, str(tmp_path / "ckpt"))
    streamed = {
        (r["url"], r["keep"], r["repaired"], r["scrubbed"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["url"], r["keep"], r["repaired"], r["scrubbed"])
        for r in quality_filter(spark.read.parquet(src), with_actions=False).collect()
    }
    assert streamed == batch and len(streamed) == 200


# ---- corpus: global line dedup + domain policy ----------------------------

def test_line_dedup_first_occurrence_semantics(spark):
    from json_remedy_spark.functions.corpus import line_dedup

    rows = [
        (1, "alpha one\nshared boilerplate\nbeta one"),
        (2, "shared boilerplate\ngamma two"),
        (3, "delta three\nshared boilerplate"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(d).collect()}
    # first occurrence (doc 1, line 1) keeps the boilerplate; later copies drop
    assert out[1]["text"] == "alpha one\nshared boilerplate\nbeta one"
    assert out[2]["text"] == "gamma two" and out[2]["n_dropped"] == 1
    assert out[3]["text"] == "delta three" and out[3]["n_dropped"] == 1
    assert out[1]["n_dropped"] == 0 and out[1]["n_lines"] == 3


def test_line_dedup_within_doc_and_blank_exempt(spark):
    from json_remedy_spark.functions.corpus import line_dedup

    rows = [(7, "same line\n\nsame line\n\nend")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    r = line_dedup(d).collect()[0]
    # second copy inside the same doc drops; BOTH blank lines survive
    # (below min_line_chars=1 they are exempt from dedup)
    assert r["text"] == "same line\n\n\nend"
    assert r["n_dropped"] == 1 and r["n_lines"] == 5


def test_line_dedup_min_chars_exemption(spark):
    from json_remedy_spark.functions.corpus import line_dedup

    rows = [(1, "ok\nlong enough line"), (2, "ok\nlong enough line")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in line_dedup(d, min_line_chars=5).collect()}
    # 'ok' is under the 5-char floor -> kept everywhere; the long line dedups
    assert out[1] == "ok\nlong enough line"
    assert out[2] == "ok"


def test_host_boilerplate_removal(spark):
    from json_remedy_spark.functions.corpus import host_boilerplate_removal

    rows = [
        # host a.com: 4 pages, "NAV" on all 4 (chrome), "footer" on 2/4
        # (at the 0.5 threshold -> chrome), unique bodies kept
        (1, "https://a.com/1", "NAV\nbody one\nfooter"),
        (2, "https://a.com/2", "NAV\nbody two\nfooter"),
        (3, "https://a.com/3", "NAV\nbody three"),
        (4, "https://a.com/4", "NAV\n\nbody four"),
        # host b.com: only 2 pages (< min_host_pages=3) -> nothing is
        # chrome even though NAV is on both
        (5, "https://b.com/1", "NAV\nbee one"),
        (6, "https://b.com/2", "NAV\nbee two"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = {r["doc_id"]: r for r in host_boilerplate_removal(d).collect()}
    assert out[1]["text"] == "body one" and out[1]["n_dropped"] == 2
    assert out[2]["text"] == "body two"
    assert out[3]["text"] == "body three" and out[3]["n_dropped"] == 1
    assert out[4]["text"] == "\nbody four"  # blank exempt, NAV dropped
    assert out[5]["text"] == "NAV\nbee one" and out[5]["n_dropped"] == 0
    assert out[6]["n_dropped"] == 0


def test_host_boilerplate_every_occurrence_drops(spark):
    """Unlike line_dedup there is no first-occurrence winner: chrome
    vanishes from its first page too (doc 1 above), and a line shared
    ACROSS hosts is judged per-host independently."""
    from json_remedy_spark.functions.corpus import host_boilerplate_removal

    rows = [
        (1, "https://x.com/1", "shared\nx1"),
        (2, "https://x.com/2", "shared\nx2"),
        (3, "https://x.com/3", "shared\nx3"),
        (4, "https://y.com/1", "shared\ny1"),
        (5, "https://y.com/2", "y2"),
        (6, "https://y.com/3", "y3"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = {r["doc_id"]: r["text"] for r in host_boilerplate_removal(d).collect()}
    # x.com: shared on 3/3 pages -> dropped everywhere incl. page 1
    assert out[1] == "x1" and out[2] == "x2" and out[3] == "x3"
    # y.com: shared on 1/3 pages -> below 0.5, kept
    assert out[4] == "shared\ny1"


def test_domain_of_variants(spark):
    from json_remedy_spark.functions.corpus import domain_of

    rows = [
        (1, "https://www.Example.COM/path"),
        (2, "http://User:Pw@CDN.Site.ORG:8080/a"),
        (3, "https://sub.domain.net:443/x?q=1#f"),
        (4, "ftp://Files.Example.com/pub"),
    ]
    d = spark.createDataFrame(rows, ["i", "url"])
    out = {r["i"]: r["d"] for r in d.select("i", domain_of(F.col("url")).alias("d")).collect()}
    assert out[1] == "example.com"
    assert out[2] == "cdn.site.org"
    assert out[3] == "sub.domain.net"
    assert out[4] == "files.example.com"


def test_domain_cap_keeps_first_k_per_domain(spark):
    from json_remedy_spark.functions.corpus import domain_cap

    rows = [(i, f"https://big.com/p{i:03d}", "t") for i in range(10)] + [
        (100, "https://small.org/only", "t")
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    kept = domain_cap(d, 3).select("domain", "url").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append(r["url"])
    assert sorted(by_dom["big.com"]) == [f"https://big.com/p{i:03d}" for i in range(3)]
    assert by_dom["small.org"] == ["https://small.org/only"]


def test_domain_stats_exact(spark):
    from json_remedy_spark.functions.corpus import domain_stats

    rows = [
        (1, "https://a.com/1", "xxxx"),
        (2, "https://a.com/1", "xxxxxx"),  # same url twice
        (3, "https://www.a.com/2", "xx"),
        (4, "https://b.net/1", "x"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    out = {r["domain"]: r for r in domain_stats(d).collect()}
    assert out["a.com"]["n_docs"] == 3 and out["a.com"]["n_urls"] == 2
    assert out["a.com"]["avg_chars"] == (4 + 6 + 2) / 3
    assert out["b.net"]["n_docs"] == 1


# ---- fastText-style hashed linear langid ----------------------------------

def test_hashed_langid_recovers_prose_language(spark):
    """On the synthesized web corpus (real en/de/fr prose wrappers) the
    hashed-bigram linear model must recover the page language."""
    from json_remedy_spark.functions.langid import hashed_langid
    from json_remedy_spark.sources.webpages import synthesize_corpus

    pages, _ = synthesize_corpus(spark, 300, partitions=4)
    d = pages.select(
        F.xxhash64("url").alias("doc_id"), "lang",
        F.col("text").alias("text"),
    ).where(F.col("lang").isin("en", "de", "fr"))
    out = hashed_langid(d).join(d.select("doc_id", "lang"), "doc_id")
    n = out.count()
    hits = out.where(F.col("ft_lang") == F.col("lang")).count()
    assert n > 100
    assert hits / n >= 0.9, f"langid accuracy {hits}/{n}"


def test_hashed_langid_edge_inputs(spark):
    from json_remedy_spark.functions.langid import hashed_langid

    rows = [(1, ""), (2, "a"), (3, "🚀💯 中文 текст"), (4, None),
            (5, "der und die das ist nicht"), (6, "le et la les dans")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in hashed_langid(d).collect()}
    # no bigrams / no weighted hits -> 'xx' with zero scores
    assert out[1]["ft_lang"] == "xx" and out[2]["ft_lang"] == "xx"
    assert out[4]["ft_lang"] == "xx"
    assert out[5]["ft_lang"] == "de" and out[5]["s_de"] > out[5]["s_en"]
    assert out[6]["ft_lang"] == "fr"


def test_hashed_langid_weight_table_is_sparse_and_deterministic():
    from json_remedy_spark.functions.langid import FT_BUCKETS, ft_weight_rows

    rows = ft_weight_rows()
    assert rows == ft_weight_rows()  # deterministic
    assert 0 < len(rows) <= FT_BUCKETS
    assert all(0 <= b < FT_BUCKETS for b, _ in rows)
    # every language contributes signal somewhere
    totals = [sum(ws[i] for _, ws in rows) for i in range(3)]
    assert all(t > 20 for t in totals)


def test_domain_cap_two_phase_matches_single_window(spark):
    """The salted two-phase top-K must equal the direct window exactly
    (the DuckDB oracle is the direct window)."""
    from json_remedy_spark.functions.corpus import domain_cap, domain_of
    from pyspark.sql import Window

    rows = [(i, f"https://dom{i % 3}.com/p{(i * 37) % 100:03d}x{i}", "t")
            for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    two = {(r["domain"], r["url"], r["rk"])
           for r in domain_cap(d, 7, n_salts=5).select("domain", "url", "rk").collect()}
    w = Window.partitionBy("domain").orderBy("url")
    direct = {
        (r["domain"], r["url"], r["rk"])
        for r in d.withColumn("domain", domain_of(F.col("url")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .select("domain", "url", "rk")
        .collect()
    }
    assert two == direct and len(two) == 21


def test_vocab_stats_counts_and_topk(spark):
    from json_remedy_spark.functions.textstats import vocab_stats

    rows = [(1, "The cat and the dog"), (2, "a CAT sleeps"), (3, "dog! dog? dog.")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["word"]: (r["n_docs"], r["n_occ"]) for r in vocab_stats(d).collect()}
    assert out["the"] == (1, 2)   # twice in doc 1 only (case-folded)
    assert out["cat"] == (2, 2)
    assert out["dog"] == (2, 4)
    top2 = [r["word"] for r in vocab_stats(d, top_k=2).collect()]
    assert set(top2) == {"dog", "cat"} or set(top2) == {"dog", "the"}
    # deterministic tie-break: cat and the both have n_occ=2 -> 'cat' wins
    assert top2[0] == "dog" and top2[1] == "cat"


def test_vocab_stats_topk_uses_bounded_sort(spark):
    from json_remedy_spark.functions.textstats import vocab_stats

    d = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = vocab_stats(d, top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-K, no full sort


def test_stream_line_dedup_across_restarts(spark, tmp_path):
    """Streaming boilerplate removal: lines seen in an earlier run's
    store drop in later runs; within-batch first-occurrence is the
    deterministic (url, line_no) winner, matching the batch operator."""
    import datetime

    from json_remedy_spark.streaming.stream_line_dedup import (
        read_deduped,
        run_line_dedup_stream,
    )

    ts = datetime.datetime(2026, 1, 1)

    def pages(rows):
        return spark.createDataFrame(
            [(u, ts, t.encode(), t, "en") for u, t in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    src = str(tmp_path / "src")
    out, ckpt, store = (str(tmp_path / d) for d in ("out", "ckpt", "store"))

    pages([("a", "cookie banner\nunique a"), ("b", "cookie banner\nunique b")]) \
        .coalesce(1).write.mode("append").parquet(src)
    run_line_dedup_stream(spark, src, out, ckpt, store)
    got1 = {r["url"]: r["text"] for r in read_deduped(spark, out).collect()}
    assert got1["a"] == "cookie banner\nunique a"
    assert got1["b"] == "unique b"

    # restart with a NEW file: the cookie banner is in the store now;
    # 'fresh line' is new and dedups within the batch (url 'c' wins)
    pages([("c", "cookie banner\nunique c\nfresh line"),
           ("d", "fresh line\nunique d")]) \
        .coalesce(1).write.mode("append").parquet(src)
    run_line_dedup_stream(spark, src, out, ckpt, store)
    got2 = {r["url"]: r["text"] for r in read_deduped(spark, out).collect()}
    assert got2["c"] == "unique c\nfresh line"
    assert got2["d"] == "unique d"
    assert len(got2) == 4 and got2["a"] == got1["a"]


def test_line_dedup_paragraph_mode(spark):
    from json_remedy_spark.functions.corpus import line_dedup

    rows = [
        (1, "intro one\n\nshared paragraph\ntwo lines\n\noutro one"),
        (2, "shared paragraph\ntwo lines\n\nintro two"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in line_dedup(d, sep="\n\n").collect()}
    # the multi-line paragraph dedups as ONE unit; single \n is content
    assert out[1] == "intro one\n\nshared paragraph\ntwo lines\n\noutro one"
    assert out[2] == "intro two"


def test_ngram_repetition_gopher_signals(spark):
    from json_remedy_spark.functions.quality import ngram_repetition

    rows = [
        (1, "spam spam spam spam"),                      # "spam spam" 2-gram x3
        (2, "all words here are fully distinct tokens"),
        (3, "a b c d e a b c d e a b c d e"),            # every 5-gram repeats
        (4, ""),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_repetition(d).collect()}
    # doc 1: top 2-gram "spam spam" occurs 3x, len 9, total 19
    assert abs(out[1]["top2_frac"] - 3 * 9 / 19) < 1e-12
    assert out[1]["dup5_frac"] == 0.0  # no repeated 5-gram in 4 words
    # doc 2: every 2-gram unique -> top fraction = 1 occurrence
    assert out[2]["top2_frac"] < 0.4 and out[2]["dup5_frac"] == 0.0
    # doc 3: "a b c d e" (len 9) occurs 3x among its repeated 5-grams
    assert out[3]["dup5_frac"] > 0.5
    assert out[4]["top2_frac"] == 0.0 and out[4]["dup5_frac"] == 0.0


def test_ngram_repetition_tie_breaks_deterministically(spark):
    from json_remedy_spark.functions.quality import ngram_repetition

    # "b a" and "a b" both occur twice; min(-count, gram) picks "a b"
    d = spark.createDataFrame([(1, "b a b a b")], ["doc_id", "text"])
    r = ngram_repetition(d).collect()[0]
    # top gram count 2, len 3, total 9 regardless of which wins — but
    # determinism matters for the oracle; assert the exact value
    assert abs(r["top2_frac"] - 2 * 3 / 9) < 1e-12


# ---- corpus: exact duplicate-substring (token-window) removal --------------

def test_dup_span_removal_keeps_first_occurrence(spark):
    from json_remedy_spark.functions.corpus import dup_span_removal

    rows = [
        (1, "a b c d e tail1"),
        (2, "head2 a b c d e"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_span_removal(d, window=5).collect()}
    # the shared 5-gram "a b c d e" survives only at (doc 1, pos 0)
    assert out[1]["text"] == "a b c d e tail1" and out[1]["n_dropped"] == 0
    assert out[2]["text"] == "head2" and out[2]["n_dropped"] == 5
    assert out[2]["n_tokens"] == 6


def test_dup_span_removal_overlapping_windows_merge(spark):
    from json_remedy_spark.functions.corpus import dup_span_removal

    d = spark.createDataFrame([(1, "x y z x y z x y z")], ["doc_id", "text"])
    r = dup_span_removal(d, window=3).collect()[0]
    # every 3-gram repeats within the doc; winners are the first period,
    # so positions 3..8 are covered by the merged flagged windows
    assert r["text"] == "x y z"
    assert r["n_tokens"] == 9 and r["n_dropped"] == 6


def test_dup_span_removal_short_docs_untouched(spark):
    from json_remedy_spark.functions.corpus import dup_span_removal

    rows = [(1, "a b"), (2, "a b"), (3, "")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_span_removal(d, window=5).collect()}
    # identical docs, but shorter than one window -> zero windows, no dedup
    assert out[1]["text"] == "a b" and out[2]["text"] == "a b"
    assert out[3]["text"] == "" and out[3]["n_tokens"] == 1
    assert all(out[k]["n_dropped"] == 0 for k in out)


def test_dup_span_removal_min_count_threshold(spark):
    from json_remedy_spark.functions.corpus import dup_span_removal

    rows = [(1, "p q r s t u"), (2, "p q r s t v")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text"]
        for r in dup_span_removal(d, window=5, min_count=3).collect()
    }
    # the shared window occurs only twice -> below min_count=3, kept
    assert out[1] == "p q r s t u" and out[2] == "p q r s t v"


# ---- similarity: k-means cells + SemDeDup semantic dedup -------------------

def test_semantic_dedup_identical_vectors_keep_one(spark):
    from json_remedy_spark.functions.similarity import semantic_dedup

    dup = [0.6, 0.8, 0.0, 0.0]
    rows = [(i, dup) for i in range(5)] + [(9, [0.0, 0.0, 1.0, 0.0])]
    d = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(d, threshold=0.95, cells=2, iters=1).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 6
    kept = sorted(r["vec_id"] for r in out if r["keep"])
    # identical vectors share one cell by construction (assignment is a
    # pure function of the vector); ties order by vec_id, so 0 survives;
    # the orthogonal vector is below threshold everywhere -> kept
    assert kept == [0, 9]


def test_semantic_dedup_invariants_on_embeddings(spark):
    import numpy as np
    from json_remedy_spark.functions.similarity import semantic_dedup

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    rows = semantic_dedup(e, threshold=0.9, cells=8, iters=1).collect()
    src = {r["vec_id"]: np.array(r["embedding"]) for r in e.collect()}
    unit = {
        k: v / max(np.sqrt((v * v).sum()), 1e-12) for k, v in src.items()
    }
    assert len(rows) == len(src)  # every vector classified exactly once
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell_rows in by_cell.values():
        kept = [r for r in cell_rows if r["keep"]]
        dropped = [r for r in cell_rows if not r["keep"]]
        for i, a in enumerate(kept):  # kept set pairwise below threshold
            for b in kept[i + 1:]:
                assert round(float(unit[a["vec_id"]] @ unit[b["vec_id"]]), 6) < 0.9
        for dr in dropped:  # every dropped point has a kept witness
            assert any(
                round(float(unit[dr["vec_id"]] @ unit[k["vec_id"]]), 6) >= 0.9
                for k in kept
            )


def test_semantic_dedup_deterministic(spark):
    from json_remedy_spark.functions.similarity import semantic_dedup

    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    a = sorted(map(tuple, semantic_dedup(e, threshold=0.9, cells=8).collect()))
    b = sorted(map(tuple, semantic_dedup(e, threshold=0.9, cells=8).collect()))
    assert a == b


# ---- dedup: bloom-prefiltered incremental anti-join ------------------------

def test_incremental_new_docs_bloom_parity_with_anti_join(spark):
    from json_remedy_spark.functions.dedup import incremental_new_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    seen = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    with_bloom = sorted(
        map(tuple, incremental_new_docs(new, seen).collect())
    )
    plain = sorted(
        map(tuple, incremental_new_docs(new, seen, use_bloom=False).collect())
    )
    assert with_bloom == plain and len(with_bloom) > 0
    # docs divisible by 6 are in both slices with identical text -> dropped
    surviving_ids = {t[0] for t in with_bloom}
    assert all(i % 6 != 0 for i in surviving_ids)


def test_incremental_new_docs_exact_under_heavy_false_positives(spark):
    from json_remedy_spark.functions.dedup import incremental_new_docs

    rows_seen = [(i, f"seen text {i}") for i in range(50)]
    rows_new = [(100 + i, f"new text {i}") for i in range(50)] + [
        (200, "seen text 7"),
        (201, "seen text 8"),
    ]
    seen = spark.createDataFrame(rows_seen, ["doc_id", "text"])
    new = spark.createDataFrame(rows_new, ["doc_id", "text"])
    # 64-bit bloom with 100 keys saturates -> nearly every probe hits;
    # the anti-join must still remove exactly the two true duplicates
    out = incremental_new_docs(new, seen, n_bits=64, n_hashes=4)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == sorted(100 + i for i in range(50))


def test_build_bloom_no_false_negatives(spark):
    import numpy as np
    from json_remedy_spark.functions.dedup import build_bloom

    keys = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["k"])
    bm = build_bloom(keys, "k", n_bits=1 << 12, n_hashes=4)
    # re-probe every inserted key JVM-side with the same hash family
    probed = keys.select(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col("k"), F.lit(i)), F.lit(1 << 12))
                for i in range(4)
            ]
        ).alias("pos")
    ).collect()
    for r in probed:
        arr = np.array(r["pos"], dtype=np.int64)
        assert (((bm[arr >> 3] >> (arr & 7)) & 1) == 1).all()


def test_dup_span_removal_randomized_against_pure_python(spark):
    """Seeded random corpus over a tiny vocab (dense window collisions)
    cross-checked against an independent pure-Python implementation of
    the spec: winner = lexicographically-least (doc_id, pos) per
    duplicated window; covered positions drop; docs reassemble."""
    import random

    from json_remedy_spark.functions.corpus import dup_span_removal

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for d in range(40)
    }

    def ref(window, min_count):
        toks = {d: t.split(" ") for d, t in docs.items()}
        occ: dict = {}
        for d in sorted(toks):
            ts = toks[d]
            for i in range(len(ts) - window + 1):
                occ.setdefault(" ".join(ts[i : i + window]), []).append((d, i))
        covered = {d: set() for d in toks}
        for g, os_ in occ.items():
            if len(os_) >= min_count:
                for (d, i) in sorted(os_)[1:]:
                    covered[d].update(range(i, i + window))
        return {
            d: (
                " ".join(t for j, t in enumerate(ts) if j not in covered[d]),
                len(ts),
                len(covered[d]),
            )
            for d, ts in toks.items()
        }

    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    for window, min_count in [(3, 2), (4, 3)]:
        got = {
            r["doc_id"]: (r["text"], r["n_tokens"], r["n_dropped"])
            for r in dup_span_removal(df, window=window, min_count=min_count).collect()
        }
        assert got == ref(window, min_count), (window, min_count)


# ---- skew stress: hot-key behavior of the winner-selection operators -------

def test_line_dedup_hot_key_skew(spark):
    """One line duplicated across 20k docs (the '10^9-fold cookie
    banner' shape at sandbox scale): the narrow-hash winner aggregate
    must reduce it map-side and the result must stay exact."""
    from json_remedy_spark.functions.corpus import line_dedup

    hot = "please enable javascript to continue"
    rows = [(i, f"{hot}\nbody {i}") for i in range(20000)]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)
    out = line_dedup(d)
    kept_hot = out.where(F.col("text").contains(hot)).count()
    assert kept_hot == 1  # only the winner doc keeps the banner
    assert out.count() == 20000
    assert out.agg(F.sum("n_dropped")).collect()[0][0] == 19999


def test_dup_span_removal_hot_window_skew(spark):
    """The same shape at token-window granularity: a 6-token banner
    shared by 20k docs; every non-winner loses exactly the banner
    tokens, bodies survive."""
    from json_remedy_spark.functions.corpus import dup_span_removal

    banner = "please enable java script to continue"
    rows = [(i, f"{banner} body{i} tail{i}") for i in range(20000)]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)
    out = dup_span_removal(d, window=6)
    agg = out.agg(
        F.sum("n_dropped").alias("nd"),
        F.sum(F.when(F.col("text").contains("please"), 1).otherwise(0)).alias("nb"),
    ).collect()[0]
    assert agg["nb"] == 1  # winner only
    assert agg["nd"] == 19999 * 6
    bodies = out.where(~F.col("text").contains("please"))
    assert bodies.where(~F.col("text").startswith("body")).count() == 0


def test_stream_line_dedup_bloom_parity(spark, tmp_path):
    """The bloom-prefiltered streaming path must produce byte-identical
    output to the plain-join path across a restart, including under a
    saturated (tiny) bloom where almost every probe is a false
    positive."""
    import datetime

    from json_remedy_spark.streaming.stream_line_dedup import (
        read_deduped,
        run_line_dedup_stream,
    )

    ts = datetime.datetime(2026, 1, 1)

    def pages(rows):
        return spark.createDataFrame(
            [(u, ts, t.encode(), t, "en") for u, t in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    batch1 = [("a", "cookie banner\nunique a"), ("b", "cookie banner\nunique b")]
    batch2 = [("c", "cookie banner\nunique c\nfresh line"),
              ("d", "fresh line\nunique d")]

    results = {}
    for mode, bits in [("plain", 0), ("bloom", 1 << 12), ("tiny_bloom", 64)]:
        src = str(tmp_path / f"src_{mode}")
        out, ckpt, store = (
            str(tmp_path / f"{d}_{mode}") for d in ("out", "ckpt", "store")
        )
        kw = dict(use_bloom=bits > 0)
        if bits:
            kw["bloom_bits"] = bits
        pages(batch1).coalesce(1).write.mode("append").parquet(src)
        run_line_dedup_stream(spark, src, out, ckpt, store, **kw)
        pages(batch2).coalesce(1).write.mode("append").parquet(src)
        run_line_dedup_stream(spark, src, out, ckpt, store, **kw)
        results[mode] = sorted(
            (r["url"], r["text"]) for r in read_deduped(spark, out).collect()
        )
    assert results["plain"] == results["bloom"] == results["tiny_bloom"]
    assert dict(results["plain"])["c"] == "unique c\nfresh line"


def test_stateful_stream_embedding_near_dup(spark, tmp_path):
    """Streaming EMBEDDING near-dup: the multi-table hyperplane banding
    lifts to a bucket-keyed stateful stream; an identical and a
    nearly-identical vector collide with the first-seen representative
    across a restart, an orthogonal vector never does."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from json_remedy_spark.streaming.stateful_lsh import stream_embedding_near_dup

    base = [1.0, 0.2, 0.0, 0.5]
    near = [1.0, 0.21, 0.0, 0.5]
    ortho = [0.0, 0.0, 1.0, 0.0]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ])

    in_dir = tmp_path / "ein"
    in_dir.mkdir()
    out, ckpt = str(tmp_path / "eout"), str(tmp_path / "eckpt")

    def drain():
        vecs = spark.readStream.schema(schema).parquet(str(in_dir) + "/*")
        q = (
            stream_embedding_near_dup(vecs)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(0, base), (3, ortho)], schema).coalesce(1).write.parquet(
        str(in_dir / "b1")
    )
    drain()
    assert spark.read.parquet(out).count() == 0  # first occurrences

    spark.createDataFrame([(10, base), (11, near)], schema).coalesce(1).write.parquet(
        str(in_dir / "b2")
    )
    drain()
    pairs = {
        (r["doc_id"], r["rep_doc_id"])
        for r in spark.read.parquet(out).dropDuplicates(["doc_id", "rep_doc_id"]).collect()
    }
    assert (10, 0) in pairs  # identical vector collides in every table
    assert (11, 0) in pairs  # near vector shares a sign pattern
    assert not any(p[0] == 3 or p[1] == 3 for p in pairs)


def test_stage_checkpointer_resume_and_halfwritten(spark, tmp_path):
    """Stage-level resume: completed stages are read back, not
    recomputed; a half-written stage dir (no _SUCCESS) recomputes."""
    import os
    import shutil

    from json_remedy_spark.operators.checkpoint import StageCheckpointer

    calls = {"a": 0, "b": 0}

    def mk(name, rows):
        def fn():
            calls[name] += 1
            return spark.createDataFrame(rows, ["doc_id", "text"])
        return fn

    root = str(tmp_path / "stages")
    st1 = StageCheckpointer(spark, root)
    a1 = st1.stage("a", mk("a", [(1, "x")]))
    b1 = st1.stage("b", mk("b", [(2, "y")]))
    assert a1.count() == 1 and b1.count() == 1
    assert calls == {"a": 1, "b": 1} and st1.computed == ["a", "b"]

    # resume: both committed -> zero recomputation
    st2 = StageCheckpointer(spark, root)
    st2.stage("a", mk("a", [(9, "SHOULD NOT RUN")]))
    st2.stage("b", mk("b", [(9, "SHOULD NOT RUN")]))
    assert calls == {"a": 1, "b": 1} and st2.skipped == ["a", "b"]

    # half-written stage (marker removed) recomputes and overwrites
    os.remove(os.path.join(root, "b", "_SUCCESS"))
    st3 = StageCheckpointer(spark, root)
    st3.stage("a", mk("a", [(9, "no")]))
    b3 = st3.stage("b", mk("b", [(7, "fresh")]))
    assert calls == {"a": 1, "b": 2}
    assert [r["doc_id"] for r in b3.collect()] == [7]
    shutil.rmtree(root)


# ---- normalize: NFC + mojibake repair --------------------------------------

def test_mojibake_pairs_roundtrip():
    """Every generated pair inverts the sloppy-cp1252 double encoding."""
    from json_remedy_spark.functions.normalize import MOJIBAKE_PAIRS, _sloppy_cp1252

    assert len(MOJIBAKE_PAIRS) >= 25
    for broken, fixed in MOJIBAKE_PAIRS:
        assert _sloppy_cp1252(fixed.encode("utf-8")) == broken


def test_nfc_normalize_fixes_mojibake_and_composes(spark):
    from json_remedy_spark.functions.normalize import nfc_normalize

    rows = [
        (1, "itâ€™s a â€œtestâ€\x9d â€” Ã©tÃ©"),
        (2, "Café combining acute"),
        (3, "plain ascii untouched"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in nfc_normalize(d).collect()}
    assert out[1]["text"] == "it’s a “test” — été"
    assert out[1]["changed"] is True
    assert out[2]["text"] == "Café combining acute" and out[2]["changed"] is True
    assert out[3]["text"] == "plain ascii untouched" and out[3]["changed"] is False


def test_nfc_matches_duckdb(spark):
    """The Arrow NFC kernel and DuckDB's nfc_normalize implement the
    same UAX #15 — byte parity on a unicode-heavy sample."""
    import duckdb

    from json_remedy_spark.functions.normalize import nfc_normalize

    rows = [
        (1, "Å ring"), (2, "ﬁ ligature stays"), (3, "한국어 ᄒᆞᆫ"),
        (4, "ȩ́ stacked"), (5, "Ω vs Ω ohm"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in nfc_normalize(d).collect()}
    for i, t in rows:
        assert got[i] == duckdb.sql("select nfc_normalize(?)", params=[t]).fetchone()[0]


def test_ngram_repetition_null_text_row(spark):
    """A NULL text row must yield 0.0 fractions, not crash the stage
    (review r3 regression: the Arrow kernel called len(None))."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from json_remedy_spark.functions.quality import ngram_repetition

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    d = spark.createDataFrame([(1, "a a a a"), (2, None)], schema)
    out = {r["doc_id"]: r for r in ngram_repetition(d).collect()}
    assert out[2]["top2_frac"] == 0.0 and out[2]["dup5_frac"] == 0.0
    assert out[1]["top2_frac"] > 0


def test_latest_crawl_per_url(spark):
    """Latest snapshot wins per canonical URL; messy variants collapse
    to one key; ties break on the smaller doc_id."""
    from json_remedy_spark.functions.corpus import latest_crawl_per_url

    rows = [
        # three spellings of one page, increasing crawl_ts
        (1, "HTTP://Ex.COM:80/a", 100),
        (2, "http://ex.com/a?utm_source=x", 300),
        (3, "http://ex.com/a#frag", 200),
        # tie on ts -> smaller doc_id wins
        (10, "https://ex.com/b", 500),
        (11, "https://ex.com/b", 500),
        # singleton
        (20, "https://ex.com/c", 1),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url", "warc_ts"])
    out = {r["canon_url"]: r for r in latest_crawl_per_url(d).collect()}
    assert set(out) == {"http://ex.com/a", "https://ex.com/b", "https://ex.com/c"}
    a = out["http://ex.com/a"]
    assert (a["doc_id"], a["crawl_ts"], a["n_crawls"]) == (2, 300, 3)
    b = out["https://ex.com/b"]
    assert (b["doc_id"], b["n_crawls"]) == (10, 2)
    assert out["https://ex.com/c"]["n_crawls"] == 1


def test_extract_outlinks_and_host(spark):
    from json_remedy_spark.functions.webgraph import extract_outlinks, outlink_host_stats

    html = (
        '<a href="https://A.com/x">1</a><a href="/rel">2</a>'
        '<a href="http://b.org:8080/y?q=1">3</a>'
    ).encode()
    d = spark.createDataFrame([("u1", bytearray(html))], ["url", "html"])
    links = sorted(r["href"] for r in extract_outlinks(d).collect())
    assert links == ["/rel", "http://b.org:8080/y?q=1", "https://A.com/x"]
    stats = {r["dst_host"]: r for r in outlink_host_stats(d).collect()}
    # relative link dropped; hosts lowercased; port excluded from host
    assert set(stats) == {"a.com", "b.org"}
    assert stats["a.com"]["n_links"] == 1 and stats["a.com"]["n_src_pages"] == 1


def test_pagerank_cycle_and_chain(spark):
    """Hand-checked fixtures: a 3-cycle preserves the uniform rank at
    every round; a 2-chain converges to (0.15, 0.2775); a dangling
    sink still accumulates rank."""
    from json_remedy_spark.functions.webgraph import pagerank

    cyc = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank(cyc, iters=4).collect()}
    for v in ranks.values():
        assert abs(v - 1.0) < 1e-9

    chain = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(chain, iters=5).collect()}
    assert abs(got["a"] - 0.15) < 1e-9
    assert abs(got["b"] - 0.2775) < 1e-9  # 0.15 + 0.85*0.15


def test_extract_outlinks_survives_invalid_utf8(spark):
    """Real crawls contain invalid UTF-8; the lossy cast must replace
    bytes (U+FFFD), never raise ANSI MALFORMED_CHARACTER_CODING."""
    from json_remedy_spark.functions.webgraph import extract_outlinks

    bad = b'<a href="https://x.com/page">l</a>\xff\xfe<a href="https://y.org/q">m</a>'
    d = spark.createDataFrame([("u1", bytearray(bad))], ["url", "html"])
    links = sorted(r["href"] for r in extract_outlinks(d).collect())
    assert links == ["https://x.com/page", "https://y.org/q"]


def test_page_meta_fields(spark):
    from json_remedy_spark.functions.webgraph import page_meta

    full = (b'<html lang="en"><head><title>T1</title>'
            b'<link rel="canonical" href="https://e.com/c"/>'
            b'<meta name="robots" content="noindex"></head></html>')
    bare = b"<html><body>x</body></html>"
    upper = b'<HTML Lang="fr"><TITLE>T3</TITLE></HTML>'
    bad = b'<title>ok</title>\xff'
    d = spark.createDataFrame(
        [("u1", bytearray(full)), ("u2", bytearray(bare)),
         ("u3", bytearray(upper)), ("u4", bytearray(bad))],
        ["url", "html"],
    )
    out = {r["url"]: r for r in page_meta(d).collect()}
    assert out["u1"]["noindex"] and out["u1"]["canonical"] == "https://e.com/c"
    assert out["u1"]["title"] == "T1" and out["u1"]["html_lang"] == "en"
    assert not out["u2"]["noindex"] and out["u2"]["canonical"] == "" and out["u2"]["title"] == ""
    assert out["u3"]["title"] == "T3" and out["u3"]["html_lang"] == "fr"
    assert out["u4"]["title"] == "ok"  # invalid byte is lossy-replaced, not fatal


def test_script_mix_counts_and_dominant(spark):
    from json_remedy_spark.functions.langid import script_mix

    rows = [
        (1, "hello мир"),          # 5 latin, 3 cyrillic -> latin
        (2, "привет w"),           # 6 cyrillic > 1 latin -> cyrillic
        (3, "12345 !!"),           # no script chars -> none
        (4, None),                 # NULL-total: counts 0, none
        (5, "ab日本語cd"),          # tie 4 latin vs 3 han -> latin
        (6, "한국어 text"),         # 3 hangul vs 4 latin -> latin wins
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in script_mix(d).collect()}
    assert out[1]["latin"] == 5 and out[1]["cyrillic"] == 3
    assert out[1]["main_script"] == "latin"
    assert out[2]["main_script"] == "cyrillic"
    assert out[3]["main_script"] == "none" and out[3]["n_cp"] == 8
    assert out[4]["main_script"] == "none" and out[4]["n_cp"] == 0
    assert out[5]["han"] == 3 and out[5]["main_script"] == "latin"
    assert out[6]["hangul"] == 3 and out[6]["main_script"] == "latin"


def test_ppl_head_middle_tail_split(spark):
    """Per-language tertiles: lowest-ppl third -> head, ties on a grid
    bucket take the lower label; languages split independently."""
    from json_remedy_spark.functions.perplexity import ppl_head_middle_tail

    rows = [(i, "en", float(i)) for i in range(9)]  # ppl 0..8
    rows += [(100 + i, "de", 5.0 + i) for i in range(3)]  # 5,6,7
    d = spark.createDataFrame(rows, ["doc_id", "lang", "ppl"])
    out = {r["doc_id"]: r["bucket"] for r in ppl_head_middle_tail(d).collect()}
    assert [out[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # de's own cutoffs, unaffected by en's distribution
    assert (out[100], out[101], out[102]) == ("head", "middle", "tail")


def test_ppl_head_middle_tail_grid_ties(spark):
    from json_remedy_spark.functions.perplexity import ppl_head_middle_tail

    # all 6 docs in ONE grid bucket -> cum*3 >= tot at the first (only)
    # bucket -> everything is head (deterministic under any row order)
    rows = [(i, "en", 2.0 + 0.01 * i) for i in range(6)]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "ppl"])
    out = {r["bucket"] for r in ppl_head_middle_tail(d, grid=1.0).collect()}
    assert out == {"head"}


def test_robots_disallow_rules_groups(spark):
    """RFC 9309 group semantics: stacked UA runs share directives, a
    new UA run after directives starts a fresh group, named-agent
    groups never bind *, comments and case are normalized, empty
    Disallow emits nothing."""
    from json_remedy_spark.functions.webgraph import robots_disallow_rules

    txt = (
        "User-agent: megabot\n"
        "Disallow: /never\n"          # named group only -> not binding
        "User-agent: helper\n"
        "User-Agent: *\n"             # stacked run includes * -> binds
        "DISALLOW: /a  # comment\n"
        "Disallow: /b:c\n"            # ':' inside the path value
        "Disallow:\n"                 # empty -> allow-all, no rule
        "User-agent: other\n"
        "Disallow: /x\n"              # fresh group, no * -> not binding
    )
    d = spark.createDataFrame([("h.com", txt)], ["host", "robots_txt"])
    got = sorted((r["host"], r["prefix"]) for r in robots_disallow_rules(d).collect())
    assert got == [("h.com", "/a"), ("h.com", "/b:c")]


def test_robots_filter_prefix_match(spark):
    from json_remedy_spark.functions.webgraph import (
        robots_disallow_rules,
        robots_filter,
    )

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\n")],
        ["host", "robots_txt"],
    )
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/private/x"),
            (2, "https://a.com/privateer"),  # prefix match is raw-prefix: blocked
            (3, "https://a.com/public"),
            (4, "https://a.com"),            # bare authority -> path '/'
            (5, "https://b.com/private/x"),  # other host: no rules
        ],
        ["doc_id", "url"],
    )
    out = {
        r["doc_id"]: r["robots_disallowed"]
        for r in robots_filter(pages, robots_disallow_rules(robots)).collect()
    }
    assert out == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_extract_anchors_alignment(spark):
    """href/anchor stay positionally aligned through the two-pass zip,
    attributes between href and text included."""
    from json_remedy_spark.functions.webgraph import extract_anchors

    html = (b'<a href="https://a.com/1" rel="nofollow"> one </a>'
            b'<a href="/rel">two</a><a href="https://c.com/3">three</a>')
    d = spark.createDataFrame([("u", bytearray(html))], ["url", "html"])
    got = [(r["href"], r["anchor"]) for r in extract_anchors(d).collect()]
    assert got == [("https://a.com/1", "one"), ("/rel", "two"), ("https://c.com/3", "three")]


def test_mixture_sample_rates_and_determinism(spark):
    from json_remedy_spark.functions.corpus import mixture_sample

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, source string",
    )
    out = mixture_sample(docs, {"a": 0.5, "b": 2.25}).toPandas()
    a = out[out.source == "a"]
    b = out[out.source == "b"]
    # downsample: one copy each, about half survive (md5-fraction)
    assert set(a["copy"]) == {0}
    assert 400 <= len(a) <= 600
    # upsample: every b doc gets >= 2 copies, ~25% get a third
    per_b = b.groupby("doc_id")["copy"].count()
    assert len(per_b) == 1000 and per_b.min() == 2
    assert 2150 <= len(b) <= 2350
    # copy indices are dense 0..n-1 per doc
    assert (b.groupby("doc_id")["copy"].max() + 1 == per_b).all()
    # deterministic
    again = mixture_sample(docs, {"a": 0.5, "b": 2.25}).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(map(tuple, again.values.tolist()))


def test_mixture_sample_defaults_and_drop(spark):
    from json_remedy_spark.functions.corpus import mixture_sample

    docs = spark.createDataFrame(
        [(1, "keep"), (2, "gone")], "doc_id long, source string"
    )
    out = mixture_sample(docs, {"gone": 0.0}).collect()
    assert [(r["doc_id"], r["copy"]) for r in out] == [(1, 0)]
    plan = mixture_sample(docs, {"gone": 0.0})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_main_content_drops_chrome_keeps_body(spark):
    from json_remedy_spark.functions.webgraph import main_content

    body = "This is the real article content of the page with many informative words inside it."
    html = (
        '<html><head><script>var x = "<p>junk</p>";</script>'
        "<style>.a{color:red}</style></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
        f"<p>{body}</p>"
        "<li>tiny the</li>"
        '<footer>© <a href="/l">Legal</a> <a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [(1, html), (2, None), (3, "<p>no stopwords here just gibberish qqqq wwww eeee rrrr tttt yyyy</p>")],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in main_content(pages).collect()}
    assert out[1]["main_text"] == body
    assert out[1]["n_kept"] == 1 and out[1]["n_blocks"] >= 3
    assert out[2]["main_text"] == "" and out[2]["n_blocks"] == 0
    # long + low link density but zero stopwords -> dropped
    assert out[3]["n_kept"] == 0
    # zero-shuffle plan
    plan = main_content(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_main_content_link_density_boundary(spark):
    from json_remedy_spark.functions.webgraph import main_content

    # anchors inside a long informative block stay below the density
    # threshold -> block survives WITH its anchor text
    html = (
        "<p>Read the full analysis of the results in our report "
        '<a href="/r">linked here</a> for all of the details and more '
        "context about the findings.</p>"
    )
    pages = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = main_content(pages).collect()[0]
    assert row["n_kept"] == 1
    assert "linked here" in row["main_text"]


def test_blocklist_filter_suffix_semantics(spark):
    from json_remedy_spark.functions.webgraph import blocklist_filter

    pages = spark.createDataFrame(
        [
            (1, "https://Ads.Tracker.NET/x"),      # subdomain of banned, case-folded
            (2, "https://tracker.net/"),            # exact banned domain
            (3, "https://nottracker.net/"),         # different domain, no substring match
            (4, "https://good.example.com/x"),      # clean
            (5, "https://multi.bad.org/x"),         # two matching entries -> min category
            (6, "no-scheme-url"),                   # hostless
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("tracker.net", "ads"), ("bad.org", "zmalware"), ("multi.bad.org", "adult")],
        "host string, category string",
    )
    out = {r["doc_id"]: r for r in blocklist_filter(pages, bl).collect()}
    assert out[1]["blocked"] and out[1]["block_category"] == "ads"
    assert out[2]["blocked"]
    assert not out[3]["blocked"] and out[3]["block_category"] is None
    assert not out[4]["blocked"]
    # deterministic multi-match: alphabetically first category wins
    assert out[5]["block_category"] == "adult"
    assert not out[6]["blocked"]
    plan = blocklist_filter(pages, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_main_content_python_vs_duckdb_parity_fuzz():
    """Property fuzz (normalize-op precedent): the Python extraction
    and the DuckDB oracle chain agree byte-for-byte on arbitrary
    HTML-ish inputs — tags, entities, links, nested blocks, stray
    angle brackets."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from json_remedy_spark.functions import webgraph as wg

    con = duckdb.connect()
    m = wg.main_content_sql("html")
    sql = f"""
      WITH pages AS (SELECT 1 AS doc_id, ? AS html),
      segs AS (
        SELECT doc_id, x.i AS bi, x.b
        FROM (SELECT doc_id, string_split_regex({m["clean"]}, '{m["split_re"]}') AS bs
              FROM pages),
             LATERAL (SELECT unnest(bs) AS b, unnest(range(1, len(bs) + 1)) AS i) x
      ),
      scored AS (SELECT doc_id, bi, {m["block_text"]} AS t, {m["link_chars"]} AS lc FROM segs),
      nonempty AS (SELECT * FROM scored WHERE length(t) > 0),
      kept AS (
        SELECT doc_id, bi, t FROM nonempty
        WHERE length(t) >= {m["min_chars"]}
          AND lc * 1.0 / length(t) <= {m["max_density"]}
          AND {m["stopword"]}
      )
      SELECT coalesce((SELECT string_agg(t, chr(10) ORDER BY bi) FROM kept), ''),
             (SELECT count(*) FROM nonempty),
             (SELECT count(*) FROM kept)
    """

    frag = st.sampled_from([
        "<p>", "</p>", "<div class='x'>", "</div>", "<li>", "<br>",
        '<a href="/x">', "</a>", "<footer>", "<script>var x=1;</script>",
        "<!-- c -->", "&amp;", "&lt;", "&nbsp;", "<", ">",
        "the and of to in words here ", "qqq www eee ",
        "a long informative sentence about the state of the world today ",
        " ", "\n", "\t",
    ])
    html_strategy = st.lists(frag, min_size=0, max_size=25).map("".join)

    import re as _re

    block_re = _re.compile(wg._BLOCK_SPLIT)
    link_re = _re.compile(wg._LINK_CONTENT)
    from json_remedy_spark.functions.quality import STOPWORD_PATTERN

    stop_re = _re.compile(STOPWORD_PATTERN)

    def py_extract(html):
        t = _re.sub(wg._SCRIPT_STYLE, " ", html or "")
        t = _re.sub(wg._HTML_COMMENT, " ", t)
        kept, n_blocks = [], 0
        for seg in block_re.split(t):
            text = wg._block_clean(seg)
            if not text:
                continue
            n_blocks += 1
            link_chars = sum(len(wg._block_clean(x)) for x in link_re.findall(seg))
            if (
                len(text) >= wg.MIN_BLOCK_CHARS
                and link_chars / len(text) <= wg.MAX_LINK_DENSITY
                and stop_re.search(text)
            ):
                kept.append(text)
        return "\n".join(kept), n_blocks, len(kept)

    @settings(max_examples=120, deadline=None)
    @given(html_strategy)
    def check(html):
        got = con.execute(sql, [html]).fetchone()
        want = py_extract(html)
        assert (got[0], got[1], got[2]) == want, html

    check()


def test_corpus_report_percentiles_and_totals(spark):
    from json_remedy_spark.functions.corpus import corpus_report

    # 10 docs of 1 token, 10 of ~100 tokens -> p50 falls in the first
    # grid bucket (cutoff 64), p90 in the 100-token bucket (cutoff 128)
    rows = [(i, "en", "word") for i in range(10)] + [
        (10 + i, "en", " ".join(["w"] * 100)) for i in range(10)
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = {x["lang"]: x for x in corpus_report(d).collect()}["en"]
    assert r["n_docs"] == 20
    assert r["total_tokens"] == 10 * 1 + 10 * 100
    assert r["mean_tokens"] == (1010) / 20
    assert r["p50_tokens"] == 64 and r["p90_tokens"] == 128
    # languages are independent
    d2 = d.union(
        spark.createDataFrame([(99, "de", "ein wort")], "doc_id long, lang string, text string")
    )
    out = {x["lang"]: x for x in corpus_report(d2).collect()}
    assert out["de"]["n_docs"] == 1 and out["en"]["n_docs"] == 20


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from json_remedy_spark.functions.events import sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two events 10 min apart (one session), then a 31-min
        # gap (new session)
        (0, t0, 1), (1, t0 + dt.timedelta(minutes=10), 1),
        (2, t0 + dt.timedelta(minutes=41), 1),
        # user 2: single event
        (3, t0, 2),
        # exact-gap boundary: 30:00 is NOT a new session (> gap, strict)
        (4, t0, 3), (5, t0 + dt.timedelta(minutes=30), 3),
        (6, t0 + dt.timedelta(minutes=60, seconds=1), 3),
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    out = {
        (r["user_id"], r["session_no"]): r for r in sessionize(e, 30).collect()
    }
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["duration_us"] == 0
    # 30:00 exactly joins the session; 30:01 later starts a new one
    assert out[(3, 1)]["n_events"] == 2
    assert out[(3, 2)]["n_events"] == 1
    assert out[(1, 1)]["duration_us"] == 10 * 60 * 1_000_000


def test_stream_sessions_restart_and_late_finalization(spark, tmp_path):
    """Streaming sessionization (session_window + watermark): sessions
    finalize once the watermark passes their close — including across
    a restart from the checkpoint — and agree with the batch
    sessionize rollup for the finalized window."""
    import datetime as dt

    from json_remedy_spark.streaming.stream_sessions import run_once

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # batch 1: user 1 has a 2-event session; a much-later event from
    # user 2 advances the watermark far past user 1's session close
    spark.createDataFrame(
        [
            (0, t0, 1),
            (1, t0 + dt.timedelta(minutes=5), 1),
            (2, t0 + dt.timedelta(hours=6), 2),
        ],
        "event_id long, ts timestamp, user_id long",
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_once(spark, str(in_dir), out, ck, gap_minutes=30)
    rows = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["n_events"] == 2
    assert 2 not in rows  # user 2's session is still open

    # batch 2 (restart from checkpoint): an even later event finalizes
    # user 2's session
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(hours=20), 3)],
        "event_id long, ts timestamp, user_id long",
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_once(spark, str(in_dir), out, ck, gap_minutes=30)
    rows2 = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows2[2]["n_events"] == 1
    # batch-operator agreement on the finalized session
    from json_remedy_spark.functions.events import sessionize

    b = sessionize(
        spark.createDataFrame(
            [(0, t0, 1), (1, t0 + dt.timedelta(minutes=5), 1)],
            "event_id long, ts timestamp_ntz, user_id long",
        ),
        30,
    ).collect()[0]
    assert b["n_events"] == rows2[1]["n_events"]


def test_ngram_repetition_string_keyed_ids(spark):
    """VERDICT r4 #4a regression: the kernel schema derives the id
    type from the caller's frame — url/string-keyed corpora must work."""
    from json_remedy_spark.functions.quality import ngram_repetition

    d = spark.createDataFrame(
        [("u/1", "a b a b a b"), ("u/2", "x y z w v u t s")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_repetition(d).collect()}
    assert set(out) == {"u/1", "u/2"}
    assert out["u/1"]["top2_frac"] > out["u/2"]["top2_frac"]


def test_nfc_normalize_null_text_changed_is_false(spark):
    """VERDICT r4 #4b regression: NULL text must yield changed=False
    (NULL-total), not a NULL-poisoned flag."""
    from json_remedy_spark.functions.normalize import nfc_normalize

    d = spark.createDataFrame(
        [(1, None), (2, "plain")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in nfc_normalize(d).collect()}
    assert out[1]["text"] is None and out[1]["changed"] is False
    assert out[2]["changed"] is False


def test_media_dhash_deterministic_and_locality():
    """dHash kernel: deterministic, 64-bit signed, and perceptually
    local — identical payloads hash identically, a single flipped byte
    changes at most 2 bits (its cell touches two comparisons)."""
    from json_remedy_spark.functions.multimodal import dhash

    a = bytes(range(256)) * 40
    assert dhash(a) == dhash(bytes(a))
    assert -(1 << 63) <= dhash(a) < 1 << 63
    assert dhash(b"") == 0
    b = bytearray(a)
    b[100] = (b[100] + 7) % 256
    diff = bin((dhash(a) ^ dhash(bytes(b))) & ((1 << 64) - 1)).count("1")
    assert diff <= 2


def test_media_near_dup_pairs_and_pigeonhole(spark):
    """media_near_dup finds exact and near payload duplicates through
    the banded join; pairs beyond the pigeonhole bound never appear."""
    from json_remedy_spark.functions.multimodal import media_near_dup

    from json_remedy_spark.functions.multimodal import dhash

    base = b"\x89PNG" + bytes(range(256)) * 16
    # search for a single-byte perturbation that flips 1-3 dHash bits
    # (a ±delta on one cell only matters when it crosses an adjacent-
    # cell comparison) — kernel-driven so the fixture can't go stale
    h0 = dhash(base)
    near = None
    for pos in range(4, 600):
        for delta in (0x80, 0x40, 0xC0):
            cand = bytearray(base)
            cand[pos] = (cand[pos] + delta) % 256
            k = bin((h0 ^ dhash(bytes(cand))) & ((1 << 64) - 1)).count("1")
            if 1 <= k <= 3:
                near = bytes(cand)
                break
        if near:
            break
    assert near is not None
    far = bytes(reversed(base))
    rows = [("u1", base), ("u2", base), ("u3", near), ("u4", far)]
    d = spark.createDataFrame(rows, "url string, html binary")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in media_near_dup(d).collect()}
    assert pairs[("u1", "u2")] == 0
    assert ("u1", "u3") in pairs and 0 < pairs[("u1", "u3")] <= 3
    assert all(h <= 3 for h in pairs.values())
    assert not any("u4" in p for p in pairs)


def test_star_components_round_count_adversarial_scale(spark):
    """VERDICT r4 #10: the adversarial-skew drill at real edge count —
    a 100k-edge path graph (the worst case for min-label: diameter =
    n-1) through algorithm='star', with the stats_out hook pinning the
    O(log n) round-complexity claim numerically.  spark.range keeps
    the fixture distributed (no driver-side 100k-row createDataFrame).
    """
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.dedup import components_from_pairs

    n = 100_001  # 100k edges, diameter 100k
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats: dict = {}
    out = components_from_pairs(
        ids, pairs, max_iters=48, algorithm="star", stats_out=stats
    )
    assert out.where("rep_id <> 0").count() == 0 and out.count() == n
    # 2*ceil(log2(n)) + slack = 40; min-label would need 100k rounds
    assert 2 <= stats["rounds"] <= 40, stats


def test_candidate_pairs_hub_cap_semantics(spark):
    """hub_cap: buckets at or under the cap keep exact all-pairs;
    oversized buckets emit star edges to the n_hubs smallest members
    only (plus hub-hub), linear in the bucket size; a cap above every
    bucket reproduces the exact output bit-for-bit."""
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.dedup import candidate_pairs_from_banded

    rows = (
        [(i, 0, "big") for i in range(10)]      # oversized bucket, 10 docs
        + [(i, 1, "small") for i in (3, 7)]     # small bucket
        + [(99, 0, "lone")]                      # singleton bucket
    )
    banded = spark.createDataFrame(rows, ["doc_id", "band", "bucket"])

    exact = {tuple(r) for r in candidate_pairs_from_banded(banded).collect()}
    high_cap = {
        tuple(r)
        for r in candidate_pairs_from_banded(banded, hub_cap=100).collect()
    }
    # 45 pairs: C(10,2) from the big bucket; the small bucket's (3,7)
    # also arises there and dedups
    assert high_cap == exact and (3, 7) in exact and len(exact) == 45

    capped = {
        tuple(r)
        for r in candidate_pairs_from_banded(banded, hub_cap=4, n_hubs=2).collect()
    }
    # big bucket: hubs {0,1} -> edges (0,m) for m in 1..9 and (1,m) for
    # m in 2..9 = 17 star edges; small bucket stays exact
    expect = {(0, m) for m in range(1, 10)} | {(1, m) for m in range(2, 10)} | {(3, 7)}
    assert capped == expect
