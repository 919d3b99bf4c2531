"""Regression tests for the second self-review pass."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import filters
from metadata_enhanced_pretrain_datapipeline_spark.plans import FilterStep, Pipeline
from metadata_enhanced_pretrain_datapipeline_spark.schema import doc_ids_per_file, to_documents


def test_doc_ids_keep_file_prefix(spark, docs, tmp_path):
    path = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(path)
    out = doc_ids_per_file(spark.read.parquet(path))
    ids = [r.id for r in out.collect()]
    # every id carries its source file path (input_file_name captured
    # before the window shuffle), and per-file sequences start at 0
    assert all(".parquet/" in i or i.rsplit("/", 1)[0].endswith(".parquet") for i in ids)
    assert all(i.rsplit("/", 1)[0] != "" for i in ids)
    suffixes = sorted(int(i.rsplit("/", 1)[1]) for i in ids)
    assert suffixes[0] == 0 and len(ids) == 40


def test_to_documents_overlapping_key_last_wins(spark):
    df = spark.createDataFrame(
        [("7", "body", '{"lang": "json-says-de", "url": "u"}', "en")],
        "id string, text string, metadata string, lang string",
    )
    out = to_documents(df, metadata_cols=["lang"], metadata_json_col="metadata").collect()[0]
    # json.loads(...) | data semantics: the column value overrides the JSON
    assert out.metadata == {"url": "u", "lang": "en"}


def test_exclusion_sink_with_map_column(spark, docs):
    """Join-shaped dual-output filter over a Document-shaped DF (metadata
    map column) — exceptAll cannot touch maps, so the composer serializes
    them for the set op."""
    d = docs.withColumn("metadata", F.create_map(F.lit("lang"), F.col("lang")))
    block = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    removed_batches = []
    pipe = Pipeline(
        steps=[
            FilterStep(
                "ids",
                lambda df: filters.id_anti_join(df, block, "doc_id"),
                exclusion_writer=lambda df: removed_batches.append(df.collect()),
            )
        ]
    )
    kept = pipe.run(d)
    assert kept.count() == 35
    removed = removed_batches[0]
    assert sorted(r.doc_id for r in removed) == [0, 1, 2, 3, 4]
    assert all(isinstance(r.metadata, dict) and "lang" in r.metadata for r in removed)
    pipe.unpersist_all()


def test_promote_metadata_typed_columns(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.schema import promote_metadata

    df = spark.createDataFrame(
        [("1", {"toxic_score": "0.75", "pii_count": "3", "pii_list": '["a","b"]'})],
        "id string, metadata map<string,string>",
    )
    out = promote_metadata(df, ["toxic_score", "pii_count", "pii_list", "nope"])
    row = out.collect()[0]
    assert abs(row.toxic_score - 0.75) < 1e-9 and row.pii_count == 3
    assert list(row.pii_list) == ["a", "b"]
    assert "nope" not in out.columns


def test_to_documents_carries_media(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.schema import to_documents

    df = spark.createDataFrame(
        [("1", "txt", ["img://a"], "en")],
        "id string, content string, media array<string>, lang string",
    )
    out = to_documents(df, id_col="id", text_col="content", metadata_cols=["lang"])
    row = out.collect()[0]
    assert list(row.media) == ["img://a"]
