"""Direct unit coverage for exported operator functions whose query
twins implement the same semantics inline (the functions are the
user-facing API; the queries pin the semantics against DuckDB)."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.text import lang_id_scores
from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators, tokens


def test_lang_id_scores_counts_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "the the the und der la"), (2, "und der die das")],
        "doc_id long, text string")
    cols = lang_id_scores(F.col("text"))
    out = {r.doc_id: (r.en, r.de) for r in df.select(
        "doc_id", cols["en"].alias("en"), cols["de"].alias("de")).collect()}
    # occurrence counts, not distinct types: 'the' x3
    assert out[1][0] == 3 and out[1][1] >= 2
    assert out[2][0] == 0 and out[2][1] >= 3


def test_regroup_chunk_scores_max(spark):
    chunked = spark.createDataFrame(
        [(1, 0.2), (1, 0.9), (2, 0.1)], "doc_id long, score double")
    out = {r.doc_id: r.doc_score
           for r in annotators.regroup_chunk_scores(chunked).collect()}
    assert out == {1: 0.9, 2: 0.1}


def test_url_features_and_gate(spark):
    df = spark.createDataFrame(
        [(1, "https://www.site.example.com/a/b/page.html?x=1")], "id long, url string")
    out = annotators.url_features(df).collect()[0]
    assert out.url_domain.endswith("site.example.com")
    assert out.url_suffix  # non-empty path suffix
    gated = annotators.with_stochastic_gate(
        df.withColumn("m", F.lit("keep")), "m", ratio=0.0)
    assert gated.collect()[0].m == ""  # ratio 0 always empties
    gated1 = annotators.with_stochastic_gate(
        df.withColumn("m", F.lit("keep")), "m", ratio=1.0)
    assert gated1.collect()[0].m == "keep"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a b  c"), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r.n_tokens for r in tokens.token_counts(df).collect()}
    assert out == {1: 3, 2: 0}


def test_read_parquet_documents_adapter(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "hello", 0.5)], "doc_id long, body string, score double"
    ).write.parquet(src)
    from metadata_enhanced_pretrain_datapipeline_spark.sources.readers import read_parquet_documents

    docs = read_parquet_documents(spark, src, id_col="doc_id",
                                  text_col="body", metadata_cols=["score"])
    row = docs.collect()[0]
    assert row.id == "1" and row.text == "hello"


def test_run_available_now_writes_parquet(spark, tmp_path):
    import metadata_enhanced_pretrain_datapipeline_spark.streaming.events as se

    src = str(tmp_path / "in")
    spark.createDataFrame([(i,) for i in range(10)], "v long").write.parquet(src)
    stream = spark.readStream.schema("v long").parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    se.run_available_now(stream, out, ckpt)
    assert spark.read.parquet(out).count() == 10
