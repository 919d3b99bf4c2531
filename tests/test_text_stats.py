"""text_stats operator invariants (TF-IDF, inverted index, KL drift)."""

import math

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import text_stats


def _docs(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple", "p"),
         (2, "banana cherry", "p"),
         (3, "apple cherry cherry date", "q")],
        "doc_id long, text string, slice string")


def test_tf_idf_values(spark):
    out = {(r.doc_id, r.term): (r.tf, r.df_t, r.tfidf)
           for r in text_stats.tf_idf(_docs(spark)).collect()}
    # apple: doc1 tf=2, appears in 2 of 3 docs
    tf, dft, score = out[(1, "apple")]
    assert (tf, dft) == (2, 2)
    assert abs(score - 2 * (math.log(4 / 3) + 1)) < 1e-12
    # date: unique to doc3
    tf, dft, score = out[(3, "date")]
    assert (tf, dft) == (1, 1)
    assert abs(score - (math.log(4 / 2) + 1)) < 1e-12


def test_top_terms_rank_and_tiebreak(spark):
    top = text_stats.top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc1: apple (tf=2) outranks banana; doc2 tie tf=1/df=2 both -> term order
    assert sorted(by_doc[1]) == [(1, "apple"), (2, "banana")]
    assert sorted(by_doc[2]) == [(1, "banana"), (2, "cherry")]


def test_inverted_index_cap(spark):
    out = {r.term: (r.df_t, r.postings)
           for r in text_stats.inverted_index(
               _docs(spark), max_postings=1).collect()}
    assert out["date"] == (1, [3])
    # df_t=2 exceeds the cap -> postings emptied, df kept
    assert out["apple"] == (2, [])
    assert out["cherry"] == (2, [])


def test_term_drift_kl_nonnegative_total_and_smoothing(spark):
    rows = text_stats.term_distribution_drift(
        _docs(spark), F.col("slice")).collect()
    terms = {r.term for r in rows}
    # union vocabulary: 'date' never occurs in p but must still get a row
    assert terms == {"apple", "banana", "cherry", "date"}
    for r in rows:
        assert r.p > 0 and r.q > 0
    # KL(P||Q) as a sum of contributions is >= 0
    assert sum(r.kl_term for r in rows) >= 0


def test_nfc_normalize_udf_collapses_combining_marks(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import nfc_normalize_udf

    norm = nfc_normalize_udf()
    decomposed, precomposed = "e\u0301", "\u00e9"
    assert decomposed != precomposed  # distinct byte sequences going in
    df = spark.createDataFrame(
        [(decomposed,), (precomposed,), (None,), ("plain",)], "t string")
    out = [r.n for r in df.select(norm(F.col("t")).alias("n")).collect()]
    assert out[0] == out[1] == precomposed
    assert out[2] is None and out[3] == "plain"


def test_sketch_accuracy_vs_exact(spark):
    """q_sketch_stats's rows-only contract: HLL++ distinct estimates stay
    within 5% of exact per group; the approx median is an actual member
    of the value domain."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import tokens_ws

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = d.select("source", F.explode(tokens_ws(F.col("text"))).alias("term"))
    approx = {r.source: r.a for r in toks.groupBy("source").agg(
        F.approx_count_distinct("term", rsd=0.02).alias("a")).collect()}
    exact = {r.source: r.e for r in toks.groupBy("source").agg(
        F.countDistinct("term").alias("e")).collect()}
    for src, e in exact.items():
        assert abs(approx[src] - e) / e <= 0.05, (src, approx[src], e)
    lens = {r[0] for r in toks.select(F.length("term")).distinct().collect()}
    p50 = toks.agg(F.percentile_approx(F.length("term"), 0.5).alias("p")).collect()[0].p
    assert p50 in lens


def test_bm25_topk_hand_computed(spark):
    """BM25 scores match the Lucene formulation computed by hand, rank
    order follows score desc, and docs with no query term never appear."""
    out = {r.doc_id: (r.score, r.rank)
           for r in text_stats.bm25_topk(
               _docs(spark).drop("slice"), ["apple", "date"], k=5).collect()}
    n, avgdl = 3, 3.0
    idf_apple = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    idf_date = math.log(1 + (n - 1 + 0.5) / (1 + 0.5))

    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert set(out) == {1, 3}  # doc2 has neither term
    assert abs(out[1][0] - idf_apple * tfn(2, 3)) < 1e-12
    assert abs(out[3][0] - (idf_apple * tfn(1, 4) + idf_date * tfn(1, 4))) < 1e-12
    assert out[3][1] == 1 and out[1][1] == 2  # doc3's rare 'date' wins


def test_bm25_topk_k_truncates_and_ties_break_by_id(spark):
    df = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 5)], "doc_id long, text string")
    rows = text_stats.bm25_topk(df, ["same"], k=2).collect()
    # identical scores everywhere -> smallest ids win, ranks dense from 1
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] \
        == [(1, 1), (2, 2)]
