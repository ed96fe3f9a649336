"""Full training-corpus construction job — the composed user story:

  quality filter -> URL dedup -> optional per-domain cap -> global
  line dedup (boilerplate removal) -> fuzzy near-dup dedup ->
  optional benchmark decontamination -> optional per-language token
  packing

  spark-submit --py-files dist/json_remedy_spark.zip jobs/run_corpus_pipeline.py \
      --input <web pages: url, warc_ts, html, text, lang> \
      --output <dir> \
      [--eval-input <docs to decontaminate against>] \
      [--token-budget N] [--threshold 0.8] [--max-per-domain K]
      [--no-line-dedup] [--dup-span-window W] [--seen-input <store>]
      [--shard-tokens N]   output as contiguous ~N-token shards
      [--url-gate]  URL-only spam heuristics, cheapest gate, runs first
      [--rank-input <src,dst links> --rank-drop-pct P]  domain-rank floor
      [--robots-input <host,robots_txt table>]  politeness gate next
      [--boilerplate-frac F]  per-host template removal pre line-dedup
      [--dsir-target <docs> --dsir-n N]  DSIR importance resampling
      [--dsir-ratio <parquet> | --dsir-ratio-out <parquet>]  at-rest ratio
      [--blocklist-input <host,category table>]  UT1 domain ban
      [--ppl-keep head,middle]  CCNet perplexity stratified keep
      [--mixture src=rate,...]  source-mixture resampling (DoReMi)
      [--fuzzy-decon T]  LSH near-dup decontamination vs --eval-input
      [--main-content]  jusText-lite block classification (warc input)
      [--train-lm-out <dir>]  export a corpus-trained trigram LM
      [--train-bpe-out <dir>]  export an in-engine BPE merge table

Stage shapes (each documented at its operator):
  1. quality_filter — map-only DAG, one Arrow hop (repair+perplexity),
     keep/drop fusion in codegen;
  2. URL dedup — groupBy canonical_url, min url representative;
  2b. per-domain cap — exact two-phase salted top-K (no straggler on
     crawl-heavy domains);
  2c. global line dedup — C4/RefinedWeb boilerplate removal: first
     occurrence of every distinct line survives, docs reassembled,
     emptied docs dropped;
  2d. optional duplicate-substring removal — globally repeated W-token
     windows survive only at their first corpus occurrence (Lee et
     al. ExactSubstr; skew-proof hash-agg winner selection);
  2e. optional incremental gate — docs whose normalized text already
     exists in an at-rest store drop out via the bloom-prefiltered
     exact anti-join (misses never shuffle);
  3. fuzzy dedup — LSH -> exact-jaccard verify -> connected components;
     doc ids for the component graph come from xxhash64(url) (stable,
     collision-safe at 2^64 for any real corpus);
  4. decontamination — broadcast eval shingles, map-only flag;
  5. token packing — two-phase bucketed prefix sum, floor semantics.

Local drives of the composed job need a real driver heap (the
components loop localCheckpoints per round):
  PYSPARK_SUBMIT_ARGS="--driver-memory 4g pyspark-shell" python jobs/...
On a cluster, spark-submit sizes the driver as usual.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--input-format",
        choices=["table", "warc"],
        default="table",
        help="'table' = parquet/Iceberg pages table; 'warc' = a dir of "
        ".warc(.gz) archives — columnarized in-job (url, warc_ts, html "
        "+ html_to_text extraction), robots-noindex pages dropped "
        "map-side before any further spend",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--main-content",
        action="store_true",
        help="with --input-format warc: extract block-classified main "
        "content (jusText-lite — nav/footer/link-farm blocks dropped) "
        "instead of full visible text",
    )
    ap.add_argument("--eval-input", default=None)
    ap.add_argument(
        "--fuzzy-decon",
        type=float,
        default=0.0,
        help="with --eval-input: use FUZZY decontamination (bipartite "
        "minhash-LSH + exact-jaccard verify) at this jaccard threshold "
        "instead of the exact shared-shingle gate — drops docs that "
        "NEAR-duplicate an eval document (GPT-3/Pile style)",
    )
    ap.add_argument("--token-budget", type=int, default=0)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--fuzzy-max-bucket", type=int, default=512,
        help="hub-cap for the fuzzy-dedup stage: band-buckets larger "
        "than this emit verified star edges instead of exact "
        "all-pairs (bounds candidates at ~max_bucket/2 * N — the "
        "quadratic-blowup guard the sf1 rehearsal motivated for "
        "run_dedup.py; 0 disables, restoring exact all-pairs)",
    )
    ap.add_argument("--fuzzy-hubs", type=int, default=2)
    ap.add_argument(
        "--soft-dedup", type=float, default=None, metavar="EXP",
        help="SoftDeDup (He et al. 2024): instead of dropping fuzzy "
        "near-dups, keep EVERY doc and attach a sampling weight of "
        "cluster_size^-EXP over the same components (EXP=1 gives each "
        "cluster total mass 1.0); the weight column survives to the "
        "output/shards for the training loader (with --pack-sequences "
        "it lands as a (doc_id, weight) side table at <output>_weights)",
    )
    ap.add_argument("--max-per-domain", type=int, default=0)
    ap.add_argument("--no-line-dedup", action="store_true")
    ap.add_argument("--dup-span-window", type=int, default=0)
    ap.add_argument("--seen-input", default=None)
    ap.add_argument(
        "--robots-input",
        default=None,
        help="(host, robots_txt) table: parse *-agent Disallow rules "
        "and drop disallowed pages map-side (broadcast rule join) "
        "before any downstream spend",
    )
    ap.add_argument(
        "--url-gate", action="store_true",
        help="URL-only spam/quality gate (digit-heavy hosts/paths, "
        "parameter blowups, deep/long paths, subdomain stuffing, "
        "nonstandard ports — webgraph.URL_GATE thresholds).  Runs "
        "FIRST: it reads zero page bytes, so every downstream stage "
        "sees fewer rows for free (FineWeb/DCLM ordering)",
    )
    ap.add_argument(
        "--rank-input", default=None,
        help="(src, dst) host-level link table: 5-round PageRank over "
        "it, pages whose host falls in the bottom --rank-drop-pct "
        "percent of RANKED hosts are dropped (hosts absent from the "
        "graph are kept — unknown, not penalized).  Host-level "
        "metadata only: the page table never shuffles, the low-rank "
        "host set broadcasts",
    )
    ap.add_argument("--rank-drop-pct", type=float, default=10.0)
    ap.add_argument(
        "--blocklist-input",
        default=None,
        help="(host, category) domain blocklist (UT1-style): pages on "
        "a banned domain or any of its subdomains drop before any "
        "downstream spend (broadcast suffix equi-join)",
    )
    ap.add_argument(
        "--boilerplate-frac",
        type=float,
        default=0.0,
        help="enable per-host template-line removal: lines on >= FRAC "
        "of a host's pages are site chrome and every occurrence drops "
        "(runs before global line dedup so chrome never wins a "
        "first-occurrence slot)",
    )
    ap.add_argument(
        "--report-out", default=None,
        help="write the run's own dataset card: per-language rollup "
        "(docs, tokens, mean/p50/p90 token lengths) of the FINAL "
        "output as parquet at this path plus a human-readable "
        "<path>_CARD.md — the grid-exact corpus_report operator, no "
        "per-language sort",
    )
    ap.add_argument("--checkpoint-root", default=None)
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument(
        "--quality-model",
        default=None,
        help="enable the model-based quality gate: 'builtin' for the "
        "deterministic weight table, or a path to an exported "
        "fastText-format weight parquet (langid.export_ft_model)",
    )
    ap.add_argument(
        "--ppl-keep",
        default=None,
        help="CCNet stratified keep: 'head' or 'head,middle' — docs "
        "are bucketed per language by perplexity tertiles (histogram "
        "cutoffs, no global sort) and only the listed buckets survive",
    )
    ap.add_argument(
        "--dsir-target",
        default=None,
        help="enable DSIR importance resampling (Xie et al. 2023): a "
        "table of target-domain documents (text column); the surviving "
        "corpus is importance-weighted against it and the Gumbel top-N "
        "is kept (requires --dsir-n)",
    )
    ap.add_argument("--dsir-n", type=int, default=0)
    ap.add_argument("--dsir-seed", type=int, default=0)
    ap.add_argument(
        "--dsir-ratio",
        default=None,
        help="with --dsir-n: reuse an at-rest fitted log-ratio parquet "
        "(save_log_ratio format) instead of fitting against "
        "--dsir-target — the fit-once / reuse-across-dumps form",
    )
    ap.add_argument(
        "--dsir-ratio-out",
        default=None,
        help="with --dsir-target: also export the fitted log-ratio "
        "parquet for later --dsir-ratio runs",
    )
    ap.add_argument(
        "--train-lm-out",
        default=None,
        help="after the final corpus is fixed, train the char-trigram "
        "LM on it in-engine and export the sparse model tables "
        "(corpus_tri.parquet / corpus_bi.parquet) — directly loadable "
        "by make_perplexity_udf(model_paths=...) for the next crawl's "
        "scoring pass (the CCNet loop)",
    )
    ap.add_argument(
        "--train-bpe-out",
        default=None,
        help="after the final corpus is fixed, learn N BPE merges on "
        "it in-engine (--bpe-merges, default 200) and export the "
        "(rank, a, b) merge table parquet",
    )
    ap.add_argument("--bpe-merges", type=int, default=200)
    ap.add_argument(
        "--train-qc-out",
        default=None,
        help="after the final corpus is fixed, distill the heuristic "
        "keep rule into the hashed-bigram quality classifier "
        "(in-engine NB training over the SURVIVING corpus as 'hi' vs "
        "the docs the rules dropped as 'lo') and export the integer "
        "weight table — directly loadable by "
        "quality_classifier(model_path=...) to score the next crawl "
        "(the DCLM bootstrap loop)",
    )
    ap.add_argument(
        "--mixture",
        default=None,
        help="source-mixture resampling before packing: "
        "'src1=0.5,src2=2.0' — rates >1 upsample (extra copies), "
        "unlisted sources keep rate 1.0; requires a source column "
        "(falls back to lang_id when none)",
    )
    ap.add_argument(
        "--shard-tokens",
        type=int,
        default=0,
        help="write the output as contiguous ~N-token parquet shards "
        "(partitionBy shard) instead of one flat table",
    )
    ap.add_argument(
        "--pack-sequences",
        type=int,
        default=0,
        metavar="N",
        help="write the output as exact N-token packed sequences "
        "(pack_sequences: the token stream cut at exact boundaries, "
        "docs splitting across sequences; rows ordered by (seq_id, "
        "pos_in_seq)) instead of one flat table",
    )
    return ap


def run(spark, args) -> str:
    """The composed job against a caller-owned session — importable so
    tests can drive the full composition in-process and assert cache
    hygiene afterwards (VERDICT r3 #8).  Returns the summary line."""
    from pyspark.sql import functions as F

    from json_remedy_spark.functions.corpus import (
        canonical_url,
        decontaminate,
        domain_cap,
        dup_span_removal,
        line_dedup,
        pack_token_budget,
    )
    from json_remedy_spark.functions.dedup import incremental_new_docs, near_dup_components
    from json_remedy_spark.operators.checkpoint import StageCheckpointer
    from json_remedy_spark.operators.pipeline import quality_filter
    from json_remedy_spark.sources.catalog import read_table, write_table

    if args.input_format == "warc":
        from json_remedy_spark.functions.webgraph import (
            NOINDEX_PATTERN,
            html_to_text,
        )
        from json_remedy_spark.sources.warc import read_warc_pages

        raw = read_warc_pages(spark, args.input)
        h = F.col("html").cast("string")
        indexed = raw.where(~h.rlike(NOINDEX_PATTERN))
        if args.main_content:
            from json_remedy_spark.functions.webgraph import main_content

            pages = main_content(
                indexed, id_col="url", extra_cols=("warc_ts", "html")
            ).select(
                F.col("doc_id").alias("url"), "warc_ts", "html",
                F.col("main_text").alias("text"),
                F.lit("").alias("lang"),
            )
        else:
            pages = indexed.select(
                "url", "warc_ts", "html",
                html_to_text(h).alias("text"),
                F.lit("").alias("lang"),
            )
    else:
        pages = read_table(spark, args.input)

    # 0a. optional URL quality gate — the CHEAPEST filter in the stack
    # runs first (FineWeb/DCLM ordering): pure projection over the url
    # column, zero page bytes read, no join at all
    if args.url_gate:
        from json_remedy_spark.functions.webgraph import url_quality_gate

        pages = url_quality_gate(pages, url_col="url").where(
            F.col("url_ok")
        ).drop("url_ok")
    # 0. optional robots.txt politeness gate — the first thing a crawl
    # pipeline does: disallowed pages are dropped in the scan stage
    # (broadcast rule join), before a single downstream byte is spent
    if args.robots_input:
        from json_remedy_spark.functions.webgraph import (
            robots_disallow_rules,
            robots_filter,
        )

        rules = robots_disallow_rules(read_table(spark, args.robots_input))
        pages = robots_filter(pages, rules, id_col="url").where(
            ~F.col("robots_disallowed")
        ).drop("robots_disallowed")
    # 0b. optional domain blocklist (UT1 category ban): banned domains
    # and every subdomain drop map-side via the broadcast suffix join
    if args.blocklist_input:
        from json_remedy_spark.functions.webgraph import blocklist_filter

        bl = read_table(spark, args.blocklist_input)
        pages = (
            blocklist_filter(pages, bl, id_col="url")
            .where(~F.col("blocked"))
            .drop("blocked", "block_category")
        )
    # 0c. optional domain-rank gate: PageRank over a host link graph
    # (WebGraph/CommonCrawl host-level ranks are ~10^8 rows — a side
    # table, never corpus-sized); the bottom percentile of RANKED
    # hosts drops via a broadcast anti-join on the url's host
    if args.rank_input:
        from json_remedy_spark.functions.webgraph import pagerank, url_host

        ranks = pagerank(read_table(spark, args.rank_input), iters=5, damping=0.85)
        thr = ranks.agg(
            F.expr(f"percentile(rank, {args.rank_drop_pct / 100.0})").alias("t")
        ).collect()[0]["t"]
        low = ranks.where(F.col("rank") <= F.lit(thr)).select(
            F.col("node").alias("_host")
        )
        pages = (
            pages.withColumn("_host", url_host(F.col("url")))
            .join(F.broadcast(low), "_host", "left_anti")
            .drop("_host")
        )
    n_in = pages.count()
    stager = StageCheckpointer(spark, args.checkpoint_root) if args.checkpoint_root else None

    # Persisted intermediates (bloom-probed frame, LSH signatures,
    # fuzzy-dedup input, the ppl histogram's scored frame) accumulate
    # across a multi-stage run otherwise — every stage appends its
    # handles here and the job frees them all after the final write
    # materializes (ADVICE r3 / VERDICT r3 #8).
    job_handles: list = []

    def stage(name, fn):
        """Materialize + resume at global-stage granularity when a
        checkpoint root is given; plain lazy composition otherwise."""
        return stager.stage(name, fn) if stager else fn()

    # 1. quality filter (keep only passing docs; scrubbed text onward)
    kept = quality_filter(pages, with_actions=False).where("keep")

    # --train-qc-out label capture: snapshot the RULE gate's keep set
    # here, BEFORE URL dedup / line dedup / fuzzy dedup / sampling
    # mutate the survivor set — docs those stages drop are near-dup or
    # sampled-out copies of GOOD documents, and labeling them 'lo'
    # would hand the distilled classifier contradictory training
    # labels for essentially identical features (ADVICE r5).
    rule_kept_urls = kept.select("url") if args.train_qc_out else None

    # 2. URL-level dedup: when the input carries warc_ts (input_hint
    # shape) the LATEST crawl wins — a single window shuffle on
    # canon_url (latest_crawl_per_url rule); inputs without timestamps
    # fall back to the lexicographic-min representative (two shuffles:
    # groupBy + join-back)
    kept = kept.withColumn("canon_url", canonical_url(F.col("url")))
    if "warc_ts" in kept.columns:
        from pyspark.sql import Window

        w_url = Window.partitionBy("canon_url").orderBy(
            F.col("warc_ts").desc(), F.col("url").asc()
        )
        kept = (
            kept.withColumn("_rn", F.row_number().over(w_url))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        w_rep = kept.groupBy("canon_url").agg(F.min("url").alias("rep_url"))
        kept = (
            kept.join(w_rep, "canon_url")
            .where(F.col("url") == F.col("rep_url"))
            .drop("rep_url")
        )

    # 2b. optional per-domain cap (two-phase salted top-K, url order)
    if args.max_per_domain:
        kept = domain_cap(kept, args.max_per_domain).drop("domain", "rk")

    docs = stage(
        "s1_filtered",
        # --ppl-keep stratifies on the PAGE-text perplexity the filter
        # already computed (the CCNet signal — the repaired payload's
        # ppl is near-constant), so the column rides along only then
        lambda: kept.select(
            F.xxhash64("url").alias("doc_id"), F.col("scrubbed").alias("text"), "url", "lang_id",
            *(["ppl"] if args.ppl_keep else []),
        ),
    )

    # 1c. optional model-based quality gate (DCLM-style fastText head,
    # functions/classifier): keep docs the model labels 'high'; the
    # hop is map-only (extra cols ride through — no join-back shuffle)
    if args.quality_model:
        from json_remedy_spark.functions.classifier import quality_classifier

        _mp = None if args.quality_model == "builtin" else args.quality_model
        docs = stage(
            "s1c_model_gate",
            # keep the page-text ppl riding along when --ppl-keep needs
            # it downstream (review: dropping it here would silently
            # stratify on the near-constant payload perplexity)
            lambda d=docs, cols=tuple(
                ["text", "url", "lang_id"] + (["ppl"] if args.ppl_keep else [])
            ): quality_classifier(d, extra_cols=cols, model_path=_mp)
            .where(F.col("quality_label") == "high")
            .select("doc_id", *cols),
        )

    # 1d. optional CCNet perplexity stratification: per-language
    # tertile cutoffs from the (lang x grid-bucket) histogram window,
    # broadcast back for a map-side bucket label; only the listed
    # buckets continue
    if args.ppl_keep:
        from json_remedy_spark.functions.perplexity import (
            make_perplexity_udf,
            ppl_head_middle_tail,
        )

        keep_buckets = [b.strip() for b in args.ppl_keep.split(",")]

        def _pplb(d=docs):
            scored = (
                d
                if "ppl" in d.columns
                else d.withColumn("ppl", make_perplexity_udf()(F.col("text")))
            )
            b = ppl_head_middle_tail(
                scored, lang_col="lang_id", handles=job_handles
            )
            return b.where(F.col("bucket").isin(keep_buckets)).drop(
                "ppl", "bucket"
            )

        docs = stage("s1d_ppl_bucket", _pplb)

    # 2b2. optional unicode normalization (mojibake + NFC) BEFORE the
    # dedup family so broken and clean encodings of the same line/span
    # hash identically
    if args.normalize:
        from json_remedy_spark.functions.normalize import normalize_text_col

        docs = stage("s1b_normalized", lambda d=docs: normalize_text_col(d))

    # 2c. global line-level dedup (boilerplate removal); docs whose
    # every line was boilerplate drop out here
    def replace_text(d, rewritten):
        """Swap in a rewriting stage's text; docs it emptied drop out."""
        return d.drop("text").join(
            rewritten.where(F.length(F.trim("text")) > 0).select("doc_id", "text"),
            "doc_id",
        )

    # 2c0. optional per-host template removal — BEFORE global line
    # dedup, so site chrome is judged against its host's page count
    # and never survives by winning a first-occurrence slot
    if args.boilerplate_frac:
        from json_remedy_spark.functions.corpus import host_boilerplate_removal

        docs = stage(
            "s2b_host_boilerplate",
            lambda d=docs: replace_text(
                d, host_boilerplate_removal(d, max_line_frac=args.boilerplate_frac)
            ),
        )

    if not args.no_line_dedup:
        docs = stage("s2_line_dedup", lambda d=docs: replace_text(d, line_dedup(d)))

    # 2d. optional duplicate-substring removal (token-window spans)
    if args.dup_span_window:
        docs = stage(
            "s3_dup_span",
            lambda d=docs: replace_text(d, dup_span_removal(d, window=args.dup_span_window)),
        )

    # 2e. optional incremental gate against an at-rest seen store
    if args.seen_input:
        def _gate(d=docs):
            seen = read_table(spark, args.seen_input).select("text")
            fresh = incremental_new_docs(d, seen, handles=job_handles)
            return d.join(fresh.select("doc_id"), "doc_id", "left_semi")
        docs = stage("s4_incremental_gate", _gate)

    # 3. fuzzy near-dup dedup over the line-deduped scrubbed text —
    # hard drop (keep canonicals) or, with --soft-dedup, SoftDeDup
    # reweighting (keep all, attach weight)
    def _fuzzy(d=docs):
        d = d.persist()
        job_handles.append(d)
        if args.soft_dedup is not None:
            from json_remedy_spark.functions.dedup import soft_dedup_weights

            w = soft_dedup_weights(
                d, threshold=args.threshold, exponent=args.soft_dedup,
                handles=job_handles,
                hub_cap=args.fuzzy_max_bucket or None, n_hubs=args.fuzzy_hubs,
            )
            return d.join(w.select("doc_id", "weight"), "doc_id")
        comp = near_dup_components(
            d, threshold=args.threshold, handles=job_handles,
            hub_cap=args.fuzzy_max_bucket or None, n_hubs=args.fuzzy_hubs,
        )
        return d.join(comp.where("is_canonical").select("doc_id"), "doc_id", "left_semi")
    docs = stage("s5_fuzzy_dedup", _fuzzy)

    # 4. optional benchmark decontamination
    if args.eval_input:
        def _decon(d=docs):
            ev = read_table(spark, args.eval_input).select("doc_id", "text")
            if args.fuzzy_decon:
                from json_remedy_spark.functions.dedup import fuzzy_decontaminate

                pairs = fuzzy_decontaminate(
                    d, ev, threshold=args.fuzzy_decon, handles=job_handles
                )
                return d.join(
                    pairs.select("doc_id").distinct(), "doc_id", "left_anti"
                )
            flags = decontaminate(d, ev)
            return d.join(flags.where("contaminated"), "doc_id", "left_anti")
        docs = stage("s6_decontaminated", _decon)

    # 4b. optional DSIR selection toward a target-domain sample: two
    # histogram aggregates (<= B rows each), one map-only scoring
    # pass, TakeOrderedAndProject cut — the survivor set semi-joins
    # back so downstream stages see full rows
    if (args.dsir_target or args.dsir_ratio) and args.dsir_n:
        def _dsir(d=docs):
            from json_remedy_spark.functions.dsir import (
                bigram_bucket_counts,
                dsir_log_ratio,
                dsir_resample,
                dsir_weights,
                load_log_ratio,
                save_log_ratio,
            )

            d = d.persist()  # histogram + scoring passes share one scan
            job_handles.append(d)
            if args.dsir_ratio:
                lr = load_log_ratio(args.dsir_ratio)
            else:
                target = read_table(spark, args.dsir_target).select("text")
                lr = dsir_log_ratio(
                    bigram_bucket_counts(target), bigram_bucket_counts(d)
                )
                if args.dsir_ratio_out:
                    save_log_ratio(lr, args.dsir_ratio_out)
            sel = dsir_resample(
                dsir_weights(d, log_ratio=lr), args.dsir_n, seed=args.dsir_seed
            )
            return d.join(sel.select("doc_id"), "doc_id", "left_semi")
        docs = stage("s6b_dsir", _dsir)

    # 4c. optional source-mixture resampling (domain reweighting):
    # map-only; upsampled copies get a distinct doc_id via the copy
    # index so every downstream join key stays unique
    if args.mixture:
        from json_remedy_spark.functions.corpus import mixture_sample

        rates = {
            kv.split("=")[0]: float(kv.split("=")[1])
            for kv in args.mixture.split(",")
        }
        src_col = "source" if "source" in docs.columns else "lang_id"
        docs = stage(
            "s6c_mixture",
            lambda d=docs: mixture_sample(d, rates, source_col=src_col)
            .withColumn("doc_id", F.xxhash64(F.col("doc_id"), F.col("copy")))
            .drop("copy"),
        )

    # 5. optional per-language token budget
    if args.token_budget:
        def _pack(d=docs):
            packed = pack_token_budget(d, args.token_budget, lang_col="lang_id")
            return d.join(packed.select("doc_id"), "doc_id", "left_semi")
        docs = stage("s7_packed", _pack)

    # the final frame feeds up to four consumers (output write, LM
    # trainer, BPE trainer, n_out count) — persist so the multi-stage
    # DAG above materializes once instead of once per consumer
    keep_cols = ["doc_id", "url", "lang_id", "text"] + (
        ["weight"] if "weight" in docs.columns else []  # --soft-dedup
    )
    out_cols = docs.select(*keep_cols).persist()
    job_handles.append(out_cols)
    if args.shard_tokens:
        # training-loader export: contiguous ~N-token shards
        from json_remedy_spark.functions.corpus import write_token_shards

        write_token_shards(out_cols, args.output, args.shard_tokens)
    elif args.pack_sequences:
        # loader export 2: exact fixed-length packed sequences
        from json_remedy_spark.functions.corpus import pack_sequences

        pack_sequences(out_cols, args.pack_sequences).sortWithinPartitions(
            "seq_id", "pos_in_seq"
        ).write.mode("overwrite").parquet(args.output)
        if "weight" in out_cols.columns:
            # --soft-dedup composes: pack_sequences has a fixed
            # seq_id/doc_id/pos_in_seq schema, so the sampling weight
            # lands as a (doc_id, weight) side table the loader joins
            # on the packed output's doc_id (ADVICE r5)
            out_cols.select("doc_id", "weight").write.mode("overwrite").parquet(
                args.output.rstrip("/") + "_weights"
            )
    else:
        write_table(out_cols.drop("doc_id"), args.output, mode="overwrite")
    # side artifact: the dataset card — every run ships its own
    # per-language rollup (what a release README quotes), computed on
    # the exact rows that landed in --output
    if args.report_out:
        from json_remedy_spark.functions.corpus import corpus_report

        rep = corpus_report(out_cols, lang_col="lang_id")
        rows = rep.collect()  # bounded: one row per language
        from json_remedy_spark.localdf import local_frame

        local_frame(spark, rows, rep.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(args.report_out)
        with open(args.report_out.rstrip("/") + "_CARD.md", "w") as f:
            f.write(
                "# Dataset card\n\n"
                f"Input: `{args.input}`  \nOutput: `{args.output}`\n\n"
                "| lang | docs | tokens | mean | p50 | p90 |\n"
                "|---|---|---|---|---|---|\n"
            )
            for r in sorted(rows, key=lambda r: r["lang"] or ""):
                f.write(
                    f"| {r['lang']} | {r['n_docs']} | {r['total_tokens']} | "
                    f"{r['mean_tokens']} | {r['p50_tokens']} | {r['p90_tokens']} |\n"
                )
    # side artifact: train the next crawl's perplexity model on the
    # corpus we just built (CCNet: score crawl N+1 with an LM trained
    # on the cleaned output of crawl N)
    if args.train_lm_out:
        from json_remedy_spark.functions.perplexity import (
            train_trigram_counts,
            write_trained_lm,
        )

        os.makedirs(args.train_lm_out, exist_ok=True)
        write_trained_lm(
            train_trigram_counts(out_cols),
            os.path.join(args.train_lm_out, "corpus_tri.parquet"),
            os.path.join(args.train_lm_out, "corpus_bi.parquet"),
        )
    # side artifact: learn a BPE merge table on the corpus we just
    # built (tokenizer training where the data is)
    if args.train_bpe_out:
        from json_remedy_spark.functions.bpe import bpe_learn

        merges = bpe_learn(out_cols, args.bpe_merges)
        spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank long, a string, b string",
        ).write.mode("overwrite").parquet(args.train_bpe_out)
    # side artifact: distill the rule chain into the fast hashed-bigram
    # classifier (DCLM bootstrap: survivors are the positive class, the
    # docs this very run dropped are the negatives)
    if args.train_qc_out:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from json_remedy_spark.functions.classifier import train_quality_classifier

        # Negatives are the docs the RULE gate itself dropped
        # (keep=false at the quality/langid filter) — NOT everything
        # absent from the final output: near-dup copies of kept docs
        # and sampled-out good docs share the positives' features and
        # are excluded from both classes (ADVICE r5).
        raw = pages.select("url", "text")
        dropped = raw.join(rule_kept_urls, "url", "left_anti")
        labeled = out_cols.select(F.lit("hi").alias("label"), "text").unionByName(
            dropped.select(F.lit("lo").alias("label"), "text")
        )
        # SINGLE parquet FILE (classes x 256 rows collected — bounded),
        # not a Spark directory: quality_classifier(model_path=) ships
        # the artifact via sparkContext.addFile, which rejects dirs —
        # same convention as langid.export_ft_model
        rows = train_quality_classifier(labeled, handles=job_handles).collect()
        pq.write_table(
            pa.table(
                {
                    "bucket": [r["bucket"] for r in rows],
                    "lang": [r["lang"] for r in rows],
                    "weight": [r["weight"] for r in rows],
                }
            ),
            args.train_qc_out,
        )
    n_out = out_cols.count()
    for h in job_handles:
        h.unpersist()
    resume_note = (
        f" (stages computed={stager.computed} skipped={stager.skipped})" if stager else ""
    )
    if stager and stager.timings:
        import json as _json

        # machine-readable per-stage evidence line for scale rehearsals
        print(
            "stage_timings: "
            + _json.dumps({"sec": stager.timings, "bytes": stager.stage_bytes})
        )
    return f"corpus: {n_in} in -> {n_out} out -> {args.output}{resume_note}"


def main() -> None:
    from pyspark.sql import SparkSession

    args = build_parser().parse_args()
    spark = (
        SparkSession.builder.appName("jrs-corpus-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    print(run(spark, args))
    spark.stop()


if __name__ == "__main__":
    main()
