"""Containment-metric near-dup: the asymmetric complement of Jaccard.

Covers dedup.containment_pairs (shingle front end) and the
metric="containment" mode of the token-set engine — the snippet-inside-
a-doc and trimmed-clip-inside-a-video cases that symmetric Jaccard
thresholds structurally miss.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup


@pytest.fixture(scope="module")
def quote_corpus(spark):
    long_doc = " ".join(f"w{i} common body token" for i in range(30))
    snippet = " ".join(long_doc.split()[:8])
    other = "completely different text about unrelated things entirely"
    return spark.createDataFrame(
        [(1, long_doc), (2, snippet), (3, other)],
        "doc_id long, text string")


def test_containment_catches_quote_jaccard_misses(quote_corpus):
    cont = dedup.containment_pairs(quote_corpus, shingle_n=2,
                                   min_containment=0.9).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in cont] == [(1, 2, 1.0)]
    # the same pair is invisible to a symmetric 0.5 Jaccard threshold
    jac = dedup.jaccard_pairs(quote_corpus, shingle_n=2,
                              min_jaccard=0.5).collect()
    assert jac == []


def test_containment_threshold_excludes_partial_overlap(spark):
    # 4 of the snippet's 9 bigrams appear in the doc -> containment 4/9
    doc = "a b c d e unrelated tail goes here now"
    part = "a b c d e x y z q q2"
    df = spark.createDataFrame([(1, doc), (2, part)],
                               "doc_id long, text string")
    got = dedup.containment_pairs(df, shingle_n=2, min_containment=0.5)
    assert got.collect() == []
    low = dedup.containment_pairs(df, shingle_n=2, min_containment=0.1)
    [r] = low.collect()
    assert r.containment == pytest.approx(4 / 9)


def test_token_set_containment_trimmed_clip(spark):
    # clip frames are a subset: jaccard 0.4 misses at 0.5, containment 1.0
    rows = [("v1", f"f{t}") for t in range(10)]
    rows += [("c1", f"f{t}") for t in range(4)]
    rows += [("v2", f"g{t}") for t in range(10)]
    df = spark.createDataFrame(rows, "media_id string, token string")
    jac = dedup.token_set_jaccard_pairs(df, "media_id", "token",
                                        min_jaccard=0.5).collect()
    assert jac == []
    cont = dedup.token_set_jaccard_pairs(
        df, "media_id", "token", min_jaccard=0.75,
        metric="containment").collect()
    assert [(r.id_a, r.id_b, r.containment) for r in cont] == [
        ("c1", "v1", 1.0)]


def test_token_set_containment_against_store(spark):
    seen = spark.createDataFrame([("old", f"f{t}") for t in range(10)],
                                 "media_id string, token string")
    new = spark.createDataFrame([("clip", f"f{t}") for t in range(4)],
                                "media_id string, token string")
    got = dedup.token_set_jaccard_against(
        new, seen, "media_id", "token", min_jaccard=0.9,
        metric="containment").collect()
    assert [(r.new_id, r.seen_id, r.containment) for r in got] == [
        ("clip", "old", 1.0)]


def test_unknown_metric_raises(spark):
    df = spark.createDataFrame([("a", "t")], "media_id string, token string")
    with pytest.raises(ValueError, match="unknown overlap metric"):
        dedup.token_set_jaccard_pairs(df, "media_id", "token",
                                      metric="dice")
