"""Weighted sampling (Efraimidis–Spirakis), DoReMi mix, and bitext
mining — the round-9 late additions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import sampling, similarity
from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash


@pytest.fixture(scope="module")
def weighted(spark):
    rows = [(i, 1000.0 if i < 5 else 1.0) for i in range(100)]
    return spark.createDataFrame(rows, "id long, w double")


def test_weighted_sample_prefers_heavy_rows(weighted):
    """5 rows carry 1000x the weight of the other 95: across salts the
    heavy ids must dominate a 5-row sample (each heavy id's inclusion
    probability is ~0.98 under A-ES; 95 light rows together get ~2%)."""
    heavy_hits = total = 0
    for salt in range(10):
        got = [r.id for r in sampling.weighted_sample(
            weighted, F.col("w"), 5, F.col("id"), salt=salt).collect()]
        assert len(got) == 5
        heavy_hits += sum(1 for i in got if i < 5)
        total += 5
    assert heavy_hits / total > 0.8


def test_weighted_sample_deterministic_and_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "id long, w double")
    a = sorted(r.id for r in sampling.weighted_sample(
        df, F.col("w"), 10, F.col("id")).collect())
    b = sorted(r.id for r in sampling.weighted_sample(
        df, F.col("w"), 10, F.col("id")).collect())
    assert a == b == [1, 5]  # zero/negative/NULL weights can never win


def test_weighted_sample_per_group_matches_naive_window(weighted):
    df = weighted.withColumn("g", (F.col("id") % 3).cast("string"))
    got = sampling.weighted_sample_per_group(
        df, "g", F.col("w"), 7, F.col("id"), salt=3, num_ranges=4)
    naive = (df.withColumn("__es", sampling.es_key(F.col("w"), F.col("id"), 3))
             .withColumn("__rn", F.row_number().over(
                 Window.partitionBy("g").orderBy(
                     F.col("__es").desc(), F.col("id"))))
             .filter(F.col("__rn") <= 7).drop("__es", "__rn"))
    assert (sorted(map(tuple, got.select("id", "g").collect()))
            == sorted(map(tuple, naive.select("id", "g").collect())))


def test_doremi_weights_order_smoothing_and_sum(spark):
    df = spark.createDataFrame(
        [(i, ["easy", "mid", "hard"][i % 3],
          {"easy": 0.1, "mid": 0.5, "hard": 2.0}[["easy", "mid", "hard"][i % 3]])
         for i in range(60)], "id long, dom string, loss double")
    w = sampling.doremi_weights(df, "dom", F.col("loss"),
                                temperature=0.5, smoothing=0.1)
    assert set(w) == {"easy", "mid", "hard"}
    assert w["hard"] > w["mid"] > w["easy"]          # tempered by loss
    assert all(v >= 0.1 / 3 - 1e-9 for v in w.values())  # uniform floor
    assert abs(sum(w.values()) - 1.0) < 1e-6


def test_doremi_mix_respects_per_domain_budgets(spark):
    df = spark.createDataFrame(
        [(i, "hard" if i % 2 else "easy", 10,
          2.0 if i % 2 else 0.1) for i in range(200)],
        "id long, dom string, n int, loss double")
    out = sampling.doremi_mix(df, "dom", F.col("loss"), F.col("n"),
                              budget=400.0, key=F.col("id"),
                              temperature=1.0, smoothing=0.0)
    alphas = sampling.doremi_weights(df, "dom", F.col("loss"),
                                     temperature=1.0, smoothing=0.0)
    kept = {r.dom: r.tok for r in out.groupBy("dom")
            .agg(F.sum("n").alias("tok")).collect()}
    for dom, a in alphas.items():
        assert kept.get(dom, 0) <= math.floor(a * 400.0)
    assert kept["hard"] > kept.get("easy", 0)  # high-loss domain upweighted


def test_doremi_weights_guard_and_empty(spark):
    df = spark.createDataFrame([(i, str(i), 1.0) for i in range(50)],
                               "id long, dom string, loss double")
    with pytest.raises(ValueError, match="domains"):
        sampling.doremi_weights(df, "dom", F.col("loss"), max_domains=10)
    assert sampling.doremi_weights(
        df.filter(F.lit(False)), "dom", F.col("loss")) == {}


@pytest.fixture(scope="module")
def bitext(spark):
    """4 coarse centroids (axis-aligned), x corpus of 8 vectors, y = the
    identical twins (+100) plus in-list distractors (+200)."""
    import random

    rng = random.Random(7)
    cents = [[1.0 if d == j else 0.0 for d in range(8)] for j in range(4)]
    xs = []
    for i in range(8):
        base = [0.05 * rng.random() for _ in range(8)]
        base[i % 4] = 1.0
        xs.append((i, base))
    ys = [(i + 100, v) for i, v in xs]
    for i, v in xs:
        noisy = [x + 0.4 * rng.random() for x in v]
        ys.append((i + 200, noisy))
    x = spark.createDataFrame(xs, "vec_id long, embedding array<double>")
    y = spark.createDataFrame(ys, "vec_id long, embedding array<double>")
    return cents, x, y


def test_mine_bitext_finds_planted_twins(bitext):
    cents, x, y = bitext
    out = similarity.mine_bitext(x, y, cents, k=2, margin_threshold=1.0,
                                 mutual=True)
    rows = {r.x_id: r for r in out.collect()}
    # every mined pair maps x to its identical twin, at cosine 1.0
    for xid, r in rows.items():
        assert r.y_id == xid + 100
        assert r.cosine == pytest.approx(1.0, abs=1e-9)
        assert r.margin >= 1.0
    assert len(rows) >= 6  # the twins win in (nearly) every list


def test_mine_bitext_mutual_excludes_contested_pairs(bitext):
    cents, x, y = bitext
    # make y_101 identical to BOTH x_0's and x_1's twin target by
    # dropping x_1's twin: x_1's best y is now x_0's twin only if they
    # share a list AND it outranks the distractors; mutual=True must
    # never emit a y twice
    y2 = y.filter(F.col("vec_id") != 101)
    out = similarity.mine_bitext(x, y2, cents, k=2, margin_threshold=1.0,
                                 mutual=True).collect()
    ys_mined = [r.y_id for r in out]
    assert len(ys_mined) == len(set(ys_mined))


def test_mine_bitext_zero_vector_drops_out(spark, bitext):
    cents, x, y = bitext
    zero = spark.createDataFrame([(999, [0.0] * 8)],
                                 "vec_id long, embedding array<double>")
    out = similarity.mine_bitext(x.unionByName(zero), y, cents, k=2,
                                 margin_threshold=1.0)
    assert 999 not in [r.x_id for r in out.collect()]


def test_ngram_novelty_bounds_and_canary(spark, docs):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    ref = docs.filter(F.col("doc_id") % 10 == 9)  # the identical-dup rows
    out = {r.doc_id: r.novelty
           for r in dedup.ngram_novelty(docs, ref, shingle_n=3).collect()}
    for i in (9, 19, 39):
        assert out[i] == 0.0  # ref members self-match completely
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # docs sharing no trigram with the dup body stay fully novel
    assert out[1] == 1.0


def test_rp_project_shapes_and_guard(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = similarity.rp_project(df, out_dim=4)
    rows = {r.vec_id: r.rp for r in out.collect()}
    assert len(rows[1]) == 4
    assert rows[2] == [0.0, 0.0, 0.0, 0.0]  # zero vec projects to zero
    # plane 0 weights at positions 0,1,2: ((i*3+2)%11)-5 = -3, 0, 3
    assert rows[1][0] == pytest.approx(1.0 * -3 + 0.0 * 0 + 2.0 * 3)
    with pytest.raises(ValueError, match="15"):
        similarity.rp_project(df, out_dim=16)


def test_stream_image_hash_store_matches_batch(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal
    from metadata_enhanced_pretrain_datapipeline_spark.streaming import events as se

    def blobs(ids):
        rows = []
        for i in ids:
            rng = np.random.default_rng(i)
            rows.append((f"b{i}", multimodal.encode_bmp(
                rng.integers(0, 255, (16, 18, 3)).astype(np.uint8))))
        return rows

    schema = "media_id string, content binary"
    media = spark.createDataFrame(blobs(range(8)), schema)
    src, store, ck = (str(tmp_path / d) for d in ("src", "store", "ck"))
    media.filter(F.col("media_id") < "b4").write.parquet(f"{src}/p1")
    media.filter(F.col("media_id") >= "b4").write.parquet(f"{src}/p2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(src))
    se.stream_append_image_hash_store(stream, store, ck, stub=False)
    got = {(r.media_id, r.dhash)
           for r in spark.read.parquet(store).collect()}
    want = {(r.media_id, r.dhash)
            for r in multimodal.image_dhash(media, stub=False).collect()}
    assert got == want  # stream-built store byte-equals the batch projection


def test_doremi_weights_null_loss_domain_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", None), (4, "b", None)],
        "id long, dom string, loss double")
    w = sampling.doremi_weights(df, "dom", F.col("loss"), smoothing=0.0)
    assert set(w) == {"a"}  # no loss evidence -> no weight, no crash
    assert sampling.doremi_weights(
        df.filter(F.col("dom") == "b"), "dom", F.col("loss")) == {}


def test_mine_bitext_nprobe_recovers_boundary_pair(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    # x sits just on c0's side of the boundary, its translation twin
    # just on c1's side: nprobe=1 buckets them apart, nprobe=2 probes
    # across the boundary and mines the pair
    x = spark.createDataFrame([(1, [0.72, 0.69])],
                              "vec_id long, embedding array<double>")
    y = spark.createDataFrame([(101, [0.69, 0.72]), (102, [0.0, 1.0])],
                              "vec_id long, embedding array<double>")
    from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity as sim

    none = sim.mine_bitext(x, y, cents, k=2, margin_threshold=0.0,
                           mutual=False, nprobe=1).collect()
    assert none == []
    got = sim.mine_bitext(x, y, cents, k=2, margin_threshold=0.0,
                          mutual=False, nprobe=2).collect()
    assert [r.y_id for r in got] == [101]


def test_paragraph_semantic_dedup_doc_decision(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    # doc 0: four orthogonal-ish chunks (all survive); doc 1: its four
    # chunks are clones of doc 0's (all drop -> keep False); doc 2: two
    # unique + two clones of doc 0's (frac 0.5 -> keep True at 0.5)
    def v(i):
        base = [0.0] * 8
        base[i] = 1.0
        return base

    rows = [(0, c, v(c)) for c in range(4)]
    rows += [(1, c, v(c)) for c in range(4)]
    rows += [(2, 0, v(4)), (2, 1, v(5)), (2, 2, v(0)), (2, 3, v(1))]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, embedding array<double>")
    out = {r.doc_id: r for r in dedup.paragraph_semantic_dedup(
        df, threshold=0.9, num_planes=6, max_bucket_size=None,
        min_kept_frac=0.5).collect()}
    assert out[0].kept_chunks == 4 and out[0].keep
    assert out[1].kept_chunks == 0 and not out[1].keep
    assert out[2].kept_chunks == 2 and out[2].kept_frac == 0.5 and out[2].keep


def test_paragraph_semantic_dedup_empty(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    df = spark.createDataFrame(
        [], "doc_id long, chunk_id long, embedding array<double>")
    assert dedup.paragraph_semantic_dedup(df).count() == 0


def test_embedding_dedup_against_store(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    def v(i, eps=0.0):
        base = [0.0] * 8
        base[i % 8] = 1.0
        base[(i + 1) % 8] = eps
        return base

    seen = spark.createDataFrame([(v(0),), (v(1),)],
                                 "embedding array<double>")
    new = spark.createDataFrame(
        [(10, v(0)), (11, v(0, 0.1)), (12, v(4))],
        "vec_id long, embedding array<double>")
    kept = sorted(r.vec_id for r in dedup.embedding_dedup_against(
        new, seen, threshold=0.95, num_planes=6,
        max_bucket_size=None).collect())
    # 10 = exact clone of a stored vector (drops); 11 = near-clone at
    # cosine ~0.995 (drops); 12 = orthogonal to the store (survives)
    assert kept == [12]


def test_embedding_dedup_against_reuses_stored_buckets(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
    from metadata_enhanced_pretrain_datapipeline_spark.operators.similarity import lsh_bucket

    rows = [([float(j == i) for j in range(8)],) for i in range(8)]
    seen = spark.createDataFrame(rows, "embedding array<double>") \
        .withColumn("bucket", lsh_bucket(F.col("embedding"), 6))
    new = spark.createDataFrame([(1, rows[3][0])],
                                "vec_id long, embedding array<double>")
    out = dedup.embedding_dedup_against(
        new, seen, threshold=0.95, num_planes=6, max_bucket_size=None,
        seen_bucket_col="bucket")
    assert out.count() == 0  # clone caught via the persisted buckets


def test_token_balanced_shards_bounds_and_parity(spark):
    rows = [(i, 100 + (i % 7) * 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n int")
    out = sampling.token_balanced_shards(
        df, F.col("n"), 1000, F.col("id"), num_buckets=8)
    per = {r.shard: (r.docs, r.tok) for r in out.groupBy("shard").agg(
        F.count("*").alias("docs"), F.sum("n").alias("tok")).collect()}
    max_doc = 100 + 6 * 50
    # next-fit bound: a shard's first doc starts where the previous
    # shard's last doc overshot, so every non-final shard totals within
    # one max-document of the budget on either side
    shards = sorted(per)
    assert shards == list(range(len(shards)))  # max_doc < budget: no skips
    for s in shards[:-1]:
        assert 1000 - max_doc <= per[s][1] <= 1000 + max_doc
    # naive global window replay must agree exactly
    naive = (df.withColumn("__h", salted_hash(F.col("id")))
             .withColumn("__cum", F.sum("n").over(
                 Window.orderBy("__h", "id").rowsBetween(
                     Window.unboundedPreceding, Window.currentRow)))
             .withColumn("shard", F.floor(
                 (F.col("__cum") - F.col("n")) / 1000.0).cast("int")))
    assert (sorted(map(tuple, out.select("id", "shard").collect()))
            == sorted(map(tuple, naive.select("id", "shard").collect())))


def test_token_balanced_shards_null_and_zero_tokens(spark):
    df = spark.createDataFrame([(1, None), (2, 0), (3, 500)],
                               "id long, n int")
    out = sampling.token_balanced_shards(df, F.col("n"), 100, F.col("id"))
    assert out.count() == 3  # every row lands in a shard


def test_doremi_weights_stable_softmax_survives_raw_losses(spark):
    # ADVICE r9: a raw-loss column (not small excess loss) at low
    # temperature used to overflow math.exp (>~709). The max-shifted
    # softmax is algebraically identical and bounded: exp arg <= 0.
    df = spark.createDataFrame(
        [(1, "a", 5000.0), (2, "b", 5010.0), (3, "c", 4990.0)],
        "id long, dom string, loss double")
    w = sampling.doremi_weights(df, "dom", F.col("loss"),
                                temperature=0.5, smoothing=0.1)
    assert set(w) == {"a", "b", "c"}
    assert w["b"] > w["a"] > w["c"]
    assert abs(sum(w.values()) - 1.0) < 1e-6
    assert all(math.isfinite(v) for v in w.values())


def test_round_half_up_matches_spark_not_bankers():
    # exact .5 at the target digit: Spark F.round / DuckDB round go UP,
    # Python round() goes to even — one convention driver-side (ADVICE).
    assert sampling._round_half_up(2.5, 0) == 3.0
    assert sampling._round_half_up(0.25, 1) == 0.3
    assert round(0.25, 1) == 0.2  # the divergence being fixed
    assert sampling._round_half_up(0.123456789, 9) == 0.123456789


def test_paragraph_semantic_dedup_key_guards(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    neg = spark.createDataFrame(
        [(1, -1, [1.0, 0.0]), (1, 0, [0.0, 1.0])],
        "doc_id long, chunk_id long, embedding array<double>")
    with pytest.raises(ValueError, match="negative"):
        dedup.paragraph_semantic_dedup(neg)
    big = spark.createDataFrame(
        [(2**62, 0, [1.0, 0.0]), (2**62, 3, [0.0, 1.0])],
        "doc_id long, chunk_id long, embedding array<double>")
    with pytest.raises(ValueError, match="overflows"):
        dedup.paragraph_semantic_dedup(big)


def test_embedding_dedup_against_overcap_is_detectable(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup

    v0 = [1.0] + [0.0] * 7
    v4 = [0.0] * 4 + [1.0] + [0.0] * 3
    seen = spark.createDataFrame([(v0,), (v0,), (v0,), (v4,)],
                                 "embedding array<double>")
    new = spark.createDataFrame([(1, v0)],
                                "vec_id long, embedding array<double>")
    out = dedup.embedding_dedup_against(
        new, seen, threshold=0.95, num_planes=6, max_bucket_size=2)
    # the whole stored bucket (3 clones > cap 2) is excluded -> the new
    # clone is MISSED (survives); the companion stats make that visible
    assert [r.vec_id for r in out.collect()] == [1]
    got = dedup.overcap_bucket_stats(
        seen, max_bucket_size=2, num_planes=6).head()
    assert got.overcap_buckets == 1
    assert got.overcap_seen_rows == 3
    assert got.max_seen_bucket == 3
