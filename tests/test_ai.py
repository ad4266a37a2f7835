"""AI function family: deterministic adapter, batch shapes, composability
(the endpoint itself is a test double — see functions/ai.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from doris_spark.functions import ai
from doris_spark.session import load_tables


def test_classify_deterministic_and_closed(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(50)
    labels = ["code", "prose", "table"]
    out1 = {r["doc_id"]: r["c"] for r in docs.select("doc_id", ai.ai_classify("text", labels).alias("c")).collect()}
    out2 = {r["doc_id"]: r["c"] for r in docs.select("doc_id", ai.ai_classify("text", labels).alias("c")).collect()}
    assert out1 == out2
    assert set(out1.values()) <= set(labels)


def test_sentiment_groupby_composes(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(100)
    agg = (
        docs.select(ai.ai_sentiment("text").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in agg) == 100
    assert {r["s"] for r in agg} <= {"positive", "neutral", "negative"}


def test_embed_shape_and_knn_composes(spark, sf_dir):
    from doris_spark.operators.vector import cosine_similarity

    docs = load_tables(spark, sf_dir)["documents"].limit(30)
    emb = docs.select("doc_id", ai.embed("text", 8).alias("v"))
    rows = emb.collect()
    assert all(len(r["v"]) == 8 for r in rows)
    a = emb.select(F.col("doc_id").alias("ida"), F.col("v").alias("va"))
    b = emb.select(F.col("doc_id").alias("idb"), F.col("v").alias("vb"))
    sims = a.join(b, F.col("ida") < F.col("idb")).select(
        cosine_similarity("va", "vb").alias("sim")
    ).collect()
    assert all(-1.001 <= r["sim"] <= 1.001 for r in sims)


def test_mask_and_similarity(spark):
    df = spark.createDataFrame(
        [("contact me at bob@example.com or +1 (555) 123-4567 ok",)], "t STRING"
    )
    masked = df.select(ai.ai_mask("t").alias("m")).collect()[0]["m"]
    assert "<EMAIL>" in masked and "<PHONE>" in masked
    assert "bob@" not in masked

    df2 = spark.createDataFrame([("the cat sat", "the cat ran")], "a STRING, b STRING")
    sim = df2.select(ai.ai_similarity("a", "b").alias("s")).collect()[0]["s"]
    assert 0.0 < sim < 1.0


def test_ai_filter_and_prompts(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].limit(40)
    kept = docs.filter(ai.ai_filter("text", "is this about spark")).count()
    assert 0 <= kept <= 40
    out = docs.select(ai.ai_summarize("text").alias("s")).collect()
    assert all(r["s"].startswith("[gen:") for r in out)


def test_adapter_swap(spark):
    class Upper(ai.AIAdapter):
        def classify(self, texts, labels):
            return [labels[0] for _ in texts]

    old = ai._adapter
    try:
        ai.set_adapter(Upper())
        df = spark.createDataFrame([("x",), ("y",)], "t STRING")
        out = df.select(ai.ai_classify("t", ["always", "never"]).alias("c")).collect()
        assert [r["c"] for r in out] == ["always", "always"]
    finally:
        ai.set_adapter(old)
