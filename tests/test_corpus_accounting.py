"""Token-fertility accounting + quality-retention calibration curve."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.text import STOPWORDS, token_count_regex, tokens_ws


def test_token_fertility_hand_computed(spark):
    # "héllo, wörld 42" -> ws tokens: 3; BPE-ish: héllo , wörld 42 = 4;
    # bytes: 2 accented chars are 2 UTF-8 bytes each -> len + 2
    df = spark.createDataFrame([(1, "héllo, wörld 42")], "id long, t string")
    r = df.select(
        F.size(tokens_ws(F.col("t"))).alias("ws"),
        token_count_regex(F.col("t")).alias("bpe"),
        F.octet_length("t").alias("b")).head()
    assert r.ws == 3
    assert r.bpe == 4
    assert r.b == len("héllo, wörld 42") + 2


def test_retention_curve_monotone_and_anchored(spark):
    from metadata_enhanced_pretrain_datapipeline_spark import queries as q

    sf_dir = "/root/testdata/sf0.001"
    rows = q._REGISTRY["q_quality_retention_curve"][0](spark, sf_dir) \
        .orderBy("threshold").collect()
    assert len(rows) == 20
    docs = [r.docs_retained for r in rows]
    toks = [r.tokens_retained for r in rows]
    # a higher gate can never retain more
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    # threshold 0.0 retains every non-empty document
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nonempty = d.where(F.size(tokens_ws(F.col("text"))) > 0).count()
    assert docs[0] == nonempty


def test_retention_bucket_is_integer_exact(spark):
    # a doc whose score lands exactly on a threshold boundary must gate
    # consistently: 3 stopwords of 20 tokens = 0.15 -> bucket 3 -> kept
    # at threshold 0.15, dropped at 0.20
    stop3 = " ".join(list(STOPWORDS)[:3])
    filler = " ".join(f"zq{i}" for i in range(17))
    df = spark.createDataFrame([(1, f"{stop3} {filler}")], "doc_id long, text string")
    ws = tokens_ws(F.col("text"))
    stop = F.array([F.lit(w) for w in STOPWORDS])
    t = df.select(ws.alias("ws"))
    r = t.select(
        F.size("ws").alias("nt"),
        F.size(F.filter(F.col("ws"), lambda x: F.array_contains(stop, x))).alias("ns"),
    ).select(
        F.floor((F.col("ns").cast("long") * 20) / F.col("nt")).alias("bkt")).head()
    assert r.bkt == 3
