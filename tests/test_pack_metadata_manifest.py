from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators, tokens
from metadata_enhanced_pretrain_datapipeline_spark.plans import Pipeline
from metadata_enhanced_pretrain_datapipeline_spark.plans.manifest import RunManifest


def _docs_with_meta(spark, n=12, words=20):
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(words)), f"topic{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, meta string")


def test_pack_with_metadata_alignment_and_conservation(spark):
    df = _docs_with_meta(spark)
    out = tokens.pack_with_metadata(df, "doc_id", seq_len=64, shards=2).collect()
    assert all(len(r.tokens) == 64 for r in out)
    total = sum(len(r.tokens) for r in out)
    pad = sum(r.n_pad for r in out)
    meta = sum(r.n_meta_tokens for r in out)
    # non-pad tokens = text tokens + meta runs (BOC + meta tokens + EOC each)
    n_text = 12 * 20
    n_meta_expected = 12 * (1 + 1 + 1)  # one-word meta -> BOC, tok, EOC
    assert total - pad == n_text + n_meta_expected
    assert meta == n_meta_expected


def test_pack_with_metadata_runs_never_straddle(spark):
    """A meta run starts a sequence rather than splitting across two."""
    df = _docs_with_meta(spark, n=8, words=61)  # 61 text + 3 meta = 64 exactly
    out = tokens.pack_with_metadata(df, "doc_id", seq_len=64, shards=1).collect()
    for r in sorted(out, key=lambda r: r.seq_idx):
        if r.n_pad == 0 and r.n_meta_tokens:
            assert r.tokens[0] == tokens.BOC_ID  # run aligned to sequence start
            assert tokens.EOC_ID in r.tokens[:4]


def test_pack_per_sequence_reinjects(spark):
    # one long doc spanning 3 sequences of 32 -> meta at the start of each
    df = _docs_with_meta(spark, n=1, words=80)
    out = sorted(
        tokens.pack_with_metadata(df, "doc_id", seq_len=32, shards=1, per_sequence=True).collect(),
        key=lambda r: r.seq_idx,
    )
    full = [r for r in out if r.n_pad < 32]
    assert all(r.tokens[0] == tokens.BOC_ID for r in full[:3])


def test_llm_annotate_then_split(spark, docs):
    out = annotators.split_score_columns(annotators.llm_annotate(docs))
    rows = out.collect()
    assert len(rows) == 40
    assert all(0 <= r.clarity <= 9 and 0 <= r.difficulty <= 2 for r in rows)


def test_embed_documents_chunk_shapes(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 70)), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r.embeddings for r in annotators.embed_documents(df, chunk_len=32, dim=8).collect()}
    assert len(out[1]) == 3 and len(out[2]) == 1  # ceil(70/32), ceil(2/32)
    assert all(len(v) == 8 for v in out[1])
    # unit-normalized stub vectors
    assert abs(sum(x * x for x in out[1][0]) - 1.0) < 1e-5


def test_fasttext_annotate_deterministic(spark, docs):
    a = {r.doc_id: r.label for r in annotators.fasttext_annotate(docs).collect()}
    b = {r.doc_id: r.label for r in annotators.fasttext_annotate(docs).collect()}
    assert a == b and set(a.values()) <= {0, 1}


def test_run_manifest_skip(tmp_path):
    m = RunManifest(str(tmp_path / "manifest.json"))
    ran = m.run_incremental(["a", "b"], lambda u: None)
    assert ran == ["a", "b"]
    m2 = RunManifest(str(tmp_path / "manifest.json"))  # fresh process
    ran2 = m2.run_incremental(["a", "b", "c"], lambda u: None)
    assert ran2 == ["c"]


def test_run_with_stats_observe(spark, docs):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import filters
    from metadata_enhanced_pretrain_datapipeline_spark.plans import FilterStep

    pipe = Pipeline(steps=[FilterStep("len", filters.length_filter(F.col("text"), 40))])
    stats = pipe.run_with_stats(
        docs,
        sink=lambda df: df.write.format("noop").mode("overwrite").save(),
        stats={"rows_out": F.count(F.lit(1)), "chars": F.sum(F.length("text"))},
    )
    assert stats["rows_out"] > 0 and stats["chars"] > 0
