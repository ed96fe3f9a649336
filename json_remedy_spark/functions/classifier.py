"""DCLM-style model-based quality classifier — fastText architecture.

The strongest public web-corpus quality filters are 2-class fastText
models scoring "high-quality / reference-like" vs "generic web" text
(DataComp-LM, Li et al. 2024; the original fastText classifier is
Joulin et al. 2016 — hashed bag-of-char-ngram features -> linear head
-> argmax).  This module is that architecture with a deterministic,
train-free weight table so the entire scoring path — hashing, bucket
collisions included, summation, margin, label — is exercised and
DuckDB-checkable bit-exactly.  A trained export drops in via
``model_path`` exactly like the langid head (same on-disk parquet
format, ``langid.export_ft_model``; classes come from the artifact).

Relationship to the heuristic rules: `functions/quality.py` is the
C4/Gopher rule side; this is the model side.  Production pipelines run
both (rules veto, model scores), which is what ``operators/pipeline``
composes.

Scale shape: scoring is one zero-shuffle mapInPandas sharing
``langid.score_hashed_bigrams`` (vectorized utf-32 decode, per-batch
distinct-bigram hashing); the label/margin are JVM column expressions
on the integer scores, so everything downstream of the Arrow hop
codegens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_remedy_spark.functions.langid import (
    FT_BUCKETS,
    _ft_bucket,
    load_ft_model,
    score_hashed_bigrams,
)

# class order is the score-column order; sorted so a loaded artifact
# (whose classes are sorted on read) lines up
QC_CLASSES = ["hi", "lo"]

# deterministic inventories: padded-word bigrams of these words form
# the weight table, mirroring ft_weight_rows for langid.  "hi" words
# mark reference-like/expository prose (the DCLM positive set is
# instruction/encyclopedic text); "lo" words mark boilerplate/spam.
_QC_WORDS = {
    "hi": [
        "because", "therefore", "research", "study", "method", "result",
        "example", "analysis", "evidence", "theory", "definition",
        "chapter", "history", "science", "learn", "explain",
    ],
    "lo": [
        "click", "subscribe", "buy", "free", "win", "cheap", "offer",
        "deal", "sale", "limited", "casino", "bonus", "download",
        "viagra", "jackpot", "unsubscribe",
    ],
}

_QC_MODEL_CACHE: dict = {}


def qc_weight_rows() -> list[tuple[int, list[int]]]:
    """Sparse weight table: (bucket, [w_hi, w_lo]) over padded-word
    bigrams of the class inventories (same construction as
    ``langid.ft_weight_rows`` so collisions behave identically)."""
    acc: dict[int, list[int]] = {}
    for ci, cls in enumerate(QC_CLASSES):
        for word in _QC_WORDS[cls]:
            s = f" {word} "
            for i in range(len(s) - 1):
                b = _ft_bucket(s[i : i + 2])
                acc.setdefault(b, [0] * len(QC_CLASSES))[ci] += 1
    return sorted(acc.items())


def qc_weights_values_sql() -> str:
    """The sparse weight table as a SQL VALUES list (bucket, w_hi,
    w_lo) — inlined into the DuckDB oracle."""
    rows = qc_weight_rows()
    return ", ".join(f"({b}, {ws[0]}, {ws[1]})" for b, ws in rows)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    alpha: float = 1.0,
    scale: float = 1000.0,
    handles: list | None = None,
) -> DataFrame:
    """Train the quality head IN-ENGINE — the DCLM bootstrap pattern
    (cheap teacher labels a sample, the fast hashed-bigram student
    scores the crawl): per-class smoothed naive-Bayes log-probability
    weights over the SAME hashed char-bigram features the scorer uses,

        w[b, c] = round(scale * ln((cnt[b,c] + alpha) /
                                   (tot[c] + FT_BUCKETS * alpha)))

    quantized to integers so the trained table drops STRAIGHT into the
    existing bit-exact integer scorer (``quality_classifier`` via the
    ``export_ft_model`` parquet format — (bucket, lang, weight) long
    form; class margin = scale x the doc log-likelihood ratio, class
    priors omitted as a constant shift a threshold sweep absorbs).

    Scale shape (the trigram-LM story again): ONE vocabulary-bounded
    aggregation — each Arrow batch emits per-class bucket-count
    partials (<= classes x FT_BUCKETS rows), the corpus itself never
    shuffles, and the driver sees nothing (the weight grid is a
    classes x FT_BUCKETS DataFrame).  Counting reuses the scoring
    kernel with an identity weight table, so train and score cannot
    disagree on tokenization, hashing, or collisions."""
    import numpy as np

    src = labeled.select(
        F.lower(F.col(text_col)).alias("t"), F.col(label_col).alias("y")
    )

    def gen(batches):
        eye = np.eye(FT_BUCKETS, dtype=np.int64)
        for pdf in batches:
            texts = pdf["t"].fillna("").tolist()
            counts = score_hashed_bigrams(texts, eye)  # (n_texts, B) occurrence counts
            ys = pdf["y"].to_numpy()
            out = {"y": [], "bucket": [], "cnt": []}
            for cls in pd.unique(pdf["y"]):
                m = counts[ys == cls].sum(axis=0)
                nz = np.nonzero(m)[0]
                out["y"].extend([cls] * len(nz))
                out["bucket"].extend(nz.tolist())
                out["cnt"].extend(m[nz].tolist())
            yield pd.DataFrame(out)

    partials = src.mapInPandas(gen, schema="y string, bucket int, cnt long")
    # persist the (<= classes x 256)-row aggregate: totals AND the grid
    # join both read it — without this the corpus is counted twice
    counts = partials.groupBy("y", "bucket").agg(F.sum("cnt").alias("cnt")).persist()
    if handles is not None:
        handles.append(counts)
    totals = counts.groupBy("y").agg(F.sum("cnt").alias("tot"))

    spark = labeled.sparkSession
    grid = spark.range(FT_BUCKETS).select(
        F.col("id").cast("int").alias("bucket")
    ).crossJoin(totals)  # classes x buckets, with tot attached
    full = grid.join(counts, ["y", "bucket"], "left").select(
        "y",
        "bucket",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        "tot",
    )
    return full.select(
        F.col("bucket"),
        F.col("y").alias("lang"),
        F.round(
            F.lit(float(scale))
            * F.log(
                (F.col("cnt") + F.lit(float(alpha)))
                / (F.col("tot") + F.lit(float(alpha) * FT_BUCKETS))
            ),
            0,
        ).cast("long").alias("weight"),
    )


def quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_path: str | None = None,
    extra_cols: tuple = (),
) -> DataFrame:
    """Score each doc with the 2-class fastText quality head:
    ``(doc_id, *extra_cols, s_hi, s_lo, margin, quality_label)``.

    ``margin = s_hi - s_lo`` (the integer analogue of the DCLM score
    used for threshold sweeps); ``quality_label`` is 'high' iff the
    margin is positive (ties and no-signal docs fall to 'low' — a
    filter should never keep a page the model has no evidence for).

    The id keeps its input type (string url keys work), and
    ``extra_cols`` ride through the Arrow hop unchanged so a pipeline
    can gate on the label without a join-back shuffle.

    ``model_path``: trained-model drop-in, ``langid.export_ft_model``
    parquet format shipped via SparkFiles; class names come from the
    artifact (sorted), and the output score columns are ``s_<class>``.
    """
    import numpy as np

    if model_path is None:
        classes = QC_CLASSES
        dense0 = np.zeros((FT_BUCKETS, len(classes)), dtype=np.int64)
        for b, ws in qc_weight_rows():
            dense0[b] = ws

        def get_dense():
            return dense0

    else:
        import os

        _, classes = load_ft_model(model_path)
        fname = os.path.basename(model_path)
        docs.sparkSession.sparkContext.addFile(model_path)

        def get_dense():
            from pyspark import SparkFiles

            if fname not in _QC_MODEL_CACHE:
                _QC_MODEL_CACHE[fname] = load_ft_model(SparkFiles.get(fname))[0]
            return _QC_MODEL_CACHE[fname]

    cls_arr = list(classes)
    extras = [c for c in extra_cols]
    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lower(F.col(text_col)).alias("t"),
        *extras,
    )
    id_type = src.schema["doc_id"].dataType.simpleString()
    extra_fields = "".join(
        f", {c} {src.schema[c].dataType.simpleString()}" for c in extras
    )

    def gen(batches):
        dense = get_dense()
        for pdf in batches:
            texts = pdf["t"].fillna("").tolist()
            scores = score_hashed_bigrams(texts, dense)
            out = {"doc_id": pdf["doc_id"]}
            for c in extras:
                out[c] = pdf[c]
            for ci, c in enumerate(cls_arr):
                out[f"s_{c}"] = scores[:, ci]
            yield pd.DataFrame(out)

    schema = (
        f"doc_id {id_type}{extra_fields}, "
        + ", ".join(f"s_{c} long" for c in cls_arr)
    )
    scored = src.mapInPandas(gen, schema=schema)
    if len(cls_arr) == 2:
        a, b = (F.col(f"s_{c}") for c in cls_arr)
        return scored.select(
            "doc_id",
            *extras,
            *[f"s_{c}" for c in cls_arr],
            (a - b).alias("margin"),
            F.when(a - b > 0, F.lit("high")).otherwise(F.lit("low")).alias("quality_label"),
        )
    return scored
