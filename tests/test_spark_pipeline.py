"""End-to-end Spark pipeline: corpus -> quality_filter -> F1 + bytes."""

import pytest

from json_remedy_spark.operators.pipeline import quality_filter, score_f1, salted_repartition
from json_remedy_spark.sources.webpages import synthesize_corpus

N = 2000


@pytest.fixture(scope="module")
def corpus(spark):
    docs, labels = synthesize_corpus(spark, N, partitions=4)
    return docs.cache(), labels.cache()


def test_f1_and_byte_identity(spark, corpus):
    docs, labels = corpus
    result = quality_filter(docs)
    m = score_f1(result, labels)
    assert m["n"] == N
    assert m["byte_identical_rate"] == 1.0, m
    assert m["f1"] >= 0.99, m


def test_output_schema(spark, corpus):
    docs, _ = corpus
    result = quality_filter(docs)
    names = set(result.columns)
    for c in ["url", "repaired", "ok", "keep", "scrubbed", "lang_id", "ppl", "layer_hits", "n_repairs"]:
        assert c in names


def test_with_repairs_projects_full_action_structs(spark, corpus):
    """Opt-in lineage: with_repairs surfaces the reference's full
    repair_action structs (layer/action/position/original/replacement);
    the default path omits the field from the Arrow payload entirely."""
    docs, _ = corpus
    import pyspark.sql.functions as F

    assert "repairs" not in quality_filter(docs).columns
    result = quality_filter(docs.limit(200), with_repairs=True)
    assert "repairs" in result.columns
    rows = result.where(F.col("n_repairs") > 0).select("repairs").head(5)
    assert rows
    for r in rows:
        for a in r["repairs"]:
            assert set(a.asDict()) == {"layer", "action", "position", "original", "replacement"}
            assert a["layer"] in {"layer1", "layer2", "layer3"}


def test_langid_accuracy(spark, corpus):
    docs, labels = corpus
    from json_remedy_spark.functions.langid import detect_language
    import pyspark.sql.functions as F

    got = docs.withColumn("lang_id", detect_language(F.col("text")))
    acc = (
        got.join(labels.select("url", F.col("lang").alias("true_lang"), "malformation_class"), "url")
        .where(F.col("malformation_class") != "garbage")  # symbols-only rows carry no language signal
        .agg(F.avg((F.col("lang_id") == F.col("true_lang")).cast("double")))
        .collect()[0][0]
    )
    assert acc >= 0.99, acc


def test_scrub_removes_pii(spark):
    import pyspark.sql.functions as F
    from json_remedy_spark.functions.scrub import scrub

    df = spark.createDataFrame(
        [("contact alice@example.com or 555-123-4567 ssn 123-45-6789 at 10.0.0.1",)],
        ["text"],
    )
    out = df.select(scrub(F.col("text")).alias("s")).collect()[0]["s"]
    assert "[EMAIL]" in out and "[SSN]" in out and "[IP]" in out
    assert "alice@example.com" not in out and "123-45-6789" not in out


def test_salted_repartition_spreads(spark, corpus):
    docs, _ = corpus
    rep = salted_repartition(docs, 8)
    sizes = rep.rdd.glom().map(len).collect()
    assert len(sizes) == 8
    assert max(sizes) < N  # not all rows in one partition


def test_plan_shape(spark, corpus):
    """The column stages must not multiply Python round-trips: exactly
    two ArrowEvalPython nodes (ppl + repair), scrub/keep in codegen."""
    docs, _ = corpus
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1, plan
