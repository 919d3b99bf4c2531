import math

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import cosine_similarity, dot_product
from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators, sampling, similarity
from metadata_enhanced_pretrain_datapipeline_spark.operators.aggregates import estimate_threshold


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<float>, b array<float>"
    )
    r = df.select(
        dot_product(F.col("a"), F.col("b")).alias("d"),
        cosine_similarity(F.col("a"), F.col("a")).alias("self"),
    ).collect()[0]
    assert abs(r.d - 32.0) < 1e-6 and abs(r.self - 1.0) < 1e-9


def test_mlp_filter_scores_in_range_and_deterministic(spark):
    rows = [(i, [float(j % 5 - 2) / (i + 1) for j in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out1 = {r.vec_id: r.quality_score
            for r in annotators.mlp_quality_filter(df, threshold=0.0, dim=8).collect()}
    out2 = {r.vec_id: r.quality_score
            for r in annotators.mlp_quality_filter(df, threshold=0.0, dim=8).collect()}
    assert out1 == out2 and len(out1) == 20
    assert all(0.0 < v < 1.0 for v in out1.values())


def test_chunk_explode_roundtrip(spark):
    df = spark.createDataFrame([(1, list(range(70)))], "doc_id long, toks array<int>")
    chunks = annotators.explode_chunks(df, F.col("toks"), 32).collect()
    assert len(chunks) == 3
    assert [len(c.chunk) for c in sorted(chunks, key=lambda c: c.chunk_idx)] == [32, 32, 6]
    flat = [t for c in sorted(chunks, key=lambda c: c.chunk_idx) for t in c.chunk]
    assert flat == list(range(70))


def test_estimate_threshold_matches_quantile(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "s double")
    t = estimate_threshold(df, F.col("s"), keep_top_p=0.1)
    assert abs(t - 90.0) < 1e-9


def test_brute_force_topk_orders_by_cosine(spark):
    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.brute_force_topk(df, [1.0, 0.0], k=2).collect()
    assert [r.vec_id for r in out] == [1, 2]


def test_lsh_bucket_pure_function(spark):
    df = spark.createDataFrame([(1, [0.5, -0.2, 0.8])], "vec_id long, embedding array<float>")
    b1 = df.select(similarity.lsh_bucket(F.col("embedding"), 6).alias("b")).collect()[0].b
    b2 = df.select(similarity.lsh_bucket(F.col("embedding"), 6).alias("b")).collect()[0].b
    assert b1 == b2 and 0 <= b1 < 64


def test_balanced_sample_equal_classes(spark):
    rows = [(i, i % 3 if i < 30 else 0) for i in range(50)]  # class 0 inflated
    df = spark.createDataFrame(rows, "id long, label int")
    out = sampling.balanced_sample(df, "label", F.col("id"))
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert len(set(counts.values())) == 1  # every class downsampled to min


def test_balanced_sample_matches_naive_window(spark):
    """Ranged impl must return EXACTLY the rows a per-class row_number
    window keeps (same hash order, same ties), on a skewed class layout."""
    from pyspark.sql import Window
    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash

    rows = [(i, "big" if i < 80 else ("mid" if i < 95 else "small")) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, label string")
    got = sorted((r.id, r.label) for r in
                 sampling.balanced_sample(df, "label", F.col("id"), num_buckets=7).collect())
    w = Window.partitionBy("label").orderBy(salted_hash(F.col("id")), F.col("id"))
    naive = (df.withColumn("__rk", F.row_number().over(w))
               .filter(F.col("__rk") <= 5).drop("__rk"))  # min class = 5 rows
    want = sorted((r.id, r.label) for r in naive.collect())
    assert got == want


def test_balanced_sample_fallback_many_classes(spark):
    """Above max_map_entries the per-class-window fallback must kick in
    and still balance exactly."""
    rows = [(i, i % 10) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, label int")
    out = sampling.balanced_sample(df, "label", F.col("id"), max_map_entries=3)
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert set(counts.values()) == {4}


def test_balanced_sample_plan_has_no_per_class_sort(spark):
    """Scale check (VERDICT r2 #2): the window must partition by
    (label, bucket), never by label alone — otherwise one task sorts an
    entire class."""
    rows = [(i, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, label int")
    out = sampling.balanced_sample(df, "label", F.col("id"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        part = spec.split("ASC")[0]
        assert "__b" in part, f"window partitions by class alone: {spec}"


def test_replicate_buckets_row_multiplicity(spark):
    df = spark.createDataFrame([(1, 3), (2, 1)], "id long, k int")
    out = sampling.replicate_buckets(df, F.col("k")).groupBy("id").count().collect()
    assert {r.id: r["count"] for r in out} == {1: 3, 2: 1}


def test_ivf_clusters_and_topk(spark):
    import random

    random.seed(7)
    centers = [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [x + random.uniform(-0.3, 0.3) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = similarity.kmeans_fit(df, k=3, iters=4)
    assigned = similarity.ivf_assign(df, cents)
    # every true cluster maps to exactly one learned list
    got = assigned.groupBy((F.col("vec_id") % 3).alias("truth")).agg(
        F.countDistinct("list_id").alias("n_lists")
    ).collect()
    assert all(r.n_lists == 1 for r in got)

    # IVF top-k with enough probes == brute force top-k
    query = [5.0, 0.1, 0.0]
    brute = [r.vec_id for r in similarity.brute_force_topk(df, query, k=5).collect()]
    ivf = [r.vec_id for r in similarity.ivf_topk(df, cents, query, k=5, nprobe=3).collect()]
    assert ivf == brute
    # nprobe=1 searches one list only — results confined to the query's cluster
    near = [r.vec_id for r in similarity.ivf_topk(df, cents, query, k=5, nprobe=1).collect()]
    assert all(v % 3 == 0 for v in near)


def test_ivf_quantized_store_probe(spark, tmp_path):
    """The composed production store: IVF directories of int8 codes.
    With all lists probed the result matches the full quantized scan;
    with nprobe=1 only the query's cluster is read (and the scan plan
    prunes to that directory and reads tinyint codes)."""
    import random

    random.seed(11)
    centers = [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]]
    rows = [(i, [x + random.uniform(-0.3, 0.3) for x in centers[i % 3]])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 5.0]]
    path = str(tmp_path / "ivfq")
    similarity.write_ivf_quantized_store(df, path, cents)
    back = spark.read.parquet(path)
    query = [5.0, 0.1, 0.0]

    full = [r.vec_id for r in
            similarity.quantized_topk(df, query, k=5).collect()]
    probed = [r.vec_id for r in similarity.ivf_quantized_topk(
        back, cents, query, k=5, nprobe=3).collect()]
    assert probed == full

    one = similarity.ivf_quantized_topk(back, cents, query, k=5, nprobe=1)
    assert all(r.vec_id % 3 == 0 for r in one.collect())
    plan = one._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"PartitionFilters: \[[^\]]*list_id", plan)
    assert "tinyint" in plan


def test_ivf_store_compact_latest_wins_and_codebook_guard(spark, tmp_path):
    import pytest as _pytest

    df1 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>")
    # month 2 re-embeds vector 2 (flipped direction)
    df2 = spark.createDataFrame(
        [(2, [1.0, 0.0])], "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    m1, m2, out = (str(tmp_path / p) for p in ("m1", "m2", "out"))
    similarity.write_ivf_quantized_store(df1, m1, cents)
    similarity.write_ivf_quantized_store(df2, m2, cents)
    similarity.compact_ivf_quantized_store(spark, [m1, m2], out)
    back = spark.read.parquet(out)
    rows = {r.vec_id: r for r in back.collect()}
    # latest wins: vector 2 carries month-2's codes/list (x-axis now)
    assert len(rows) == 3 and rows[2].list_id == 0
    assert list(rows[2].qvec) == [127, 0]
    # codebook stamp survives compaction; a wrong-codebook probe raises
    assert (back.schema["qvec"].metadata or {})[
        similarity.CODEBOOK_METADATA_KEY] == similarity.codebook_digest(cents)
    with _pytest.raises(ValueError, match="codebook"):
        similarity.ivf_quantized_topk(back, [[1.0, 1.0], [0.0, 1.0]],
                                      [1.0, 0.0])
    # mixing codebooks across months raises at compaction
    m3 = str(tmp_path / "m3")
    similarity.write_ivf_quantized_store(df2, m3, [[0.5, 0.5], [0.0, 1.0]])
    with _pytest.raises(ValueError, match="mix codebooks"):
        similarity.compact_ivf_quantized_store(
            spark, [m1, m3], str(tmp_path / "out2"))
    # out_path aliasing an input is refused
    with _pytest.raises(ValueError, match="out_path"):
        similarity.compact_ivf_quantized_store(spark, [m1, m2], m1)


def test_rrf_fuse_known_ranks(spark):
    import pytest as _pytest

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)],
                              "doc_id long, rank int")
    got = {r.doc_id: r.rrf_score
           for r in similarity.rrf_fuse([a, b], k=10).collect()}
    # hand-computed: doc 1 hit at ranks (1, 2), doc 3 at (3, 1),
    # docs 2/4 single-leg
    assert got[1] == _pytest.approx(1 / 61 + 1 / 62)
    assert got[3] == _pytest.approx(1 / 63 + 1 / 61)
    assert got[2] == _pytest.approx(1 / 62)
    assert got[4] == _pytest.approx(1 / 63)
    # ordering: fused hits beat single-leg hits; k truncates
    order = [r.doc_id for r in similarity.rrf_fuse([a, b], k=2).collect()]
    assert order == [1, 3]
    with _pytest.raises(ValueError, match="at least one"):
        similarity.rrf_fuse([])


def test_cluster_balanced_sample_caps_every_cluster(spark):
    # 30 vectors on the x-axis, 3 on the y-axis: cap 5 must keep all 3
    # y-cluster rows and exactly 5 of the x-cluster
    rows = [(i, [1.0 + i * 0.001, 0.0]) for i in range(30)]
    rows += [(100 + i, [0.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = similarity.cluster_balanced_sample(df, cents, cap=5).collect()
    by_list = {}
    for r in got:
        by_list.setdefault(r.list_id, []).append(r.vec_id)
    assert len(by_list[0]) == 5 and len(by_list[1]) == 3
    assert all(v >= 100 for v in by_list[1])
    # deterministic: same selection on a second run
    again = similarity.cluster_balanced_sample(df, cents, cap=5).collect()
    assert sorted((r.vec_id, r.list_id) for r in got) == \
        sorted((r.vec_id, r.list_id) for r in again)


def test_ivf_quantized_rerank_recovers_exact_topk(spark, tmp_path):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [[float(x) for x in r.embedding] for r in
             e.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    qvec = cents[0]
    path = str(tmp_path / "store")
    similarity.write_ivf_quantized_store(e, path, cents)
    back = spark.read.parquet(path).filter(F.col("vec_id") != 0)
    corpus = e.filter(F.col("vec_id") != 0)
    got = similarity.ivf_quantized_rerank_topk(
        back, corpus, cents, qvec, k=5, nprobe=4, overfetch=4).collect()
    # with ALL lists probed, the re-rank must equal exact brute force
    # (overfetch absorbs int8 rank error at the cutoff)
    want = similarity.brute_force_topk(corpus, qvec, k=5).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    assert [r.cosine for r in got] == [r.cosine for r in want]


def test_global_rank_matches_naive_window(spark, docs):
    from pyspark.sql import Window

    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash

    order = [salted_hash(F.col("doc_id"), 42), F.col("doc_id")]
    naive = {
        r.doc_id: r.pos
        for r in docs.select(
            "doc_id", F.row_number().over(Window.orderBy(*order)).cast("long").alias("pos")
        ).collect()
    }
    scalable = {
        r.doc_id: r.pos
        for r in sampling.global_rank(docs, order, num_ranges=4)
        .select("doc_id", "pos").collect()
    }
    assert scalable == naive


def test_explode_chunks_empty_tokens(spark):
    df = spark.createDataFrame([(1, []), (2, [1, 2])], "doc_id long, toks array<int>")
    out = annotators.explode_chunks(df, F.col("toks"), 32).collect()
    assert [r.doc_id for r in out] == [2]  # empty docs produce NO chunk rows


def test_replicate_zero_drops_row(spark):
    df = spark.createDataFrame([(1, 0), (2, 2)], "id long, k int")
    out = sampling.replicate_buckets(df, F.col("k")).collect()
    assert sorted(r.id for r in out) == [2, 2]


def test_kmeans_fewer_rows_than_k(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = similarity.kmeans_fit(df, k=5, iters=2)
    assert len(cents) == 2  # fits with what exists instead of IndexError


def test_global_rank_string_primary_key(spark):
    """String order columns use an order-preserving byte-prefix key — they
    must still rank correctly and spread across ranges (a silent all-null
    cast would collapse every row into range 0)."""
    from pyspark.sql import Window

    rows = [(i, w) for i, w in enumerate(
        ["delta", "alpha", "echo", "bravo", "charlie", "foxtrot", "golf", "hotel"] * 25)]
    df = spark.createDataFrame(rows, "rid long, word string")
    order = [F.col("word"), F.col("rid")]
    naive = {r.rid: r.pos for r in df.select(
        "rid", F.row_number().over(Window.orderBy(*order)).cast("long").alias("pos")
    ).collect()}
    got = {r.rid: r.pos
           for r in sampling.global_rank(df, order, num_ranges=4).select("rid", "pos").collect()}
    assert got == naive


def test_global_rank_date_primary_key(spark):
    """DATE order columns get the unix_date surrogate (ADVICE r2: the old
    blanket cast('double') raised AnalysisException under ANSI)."""
    import datetime
    from pyspark.sql import Window

    rows = [(i, datetime.date(2024, 1 + (i * 7) % 12, 1 + (i * 11) % 28))
            for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, d date")
    order = [F.col("d"), F.col("rid")]
    naive = {r.rid: r.pos for r in df.select(
        "rid", F.row_number().over(Window.orderBy(*order)).cast("long").alias("pos")
    ).collect()}
    got = {r.rid: r.pos
           for r in sampling.global_rank(df, order, num_ranges=4).select("rid", "pos").collect()}
    assert got == naive


def test_global_rank_rejects_unorderable_surrogate(spark):
    """Non-castable primary order types must raise a CLEAR error, not an
    AnalysisException from deep inside the quantile probe."""
    import pytest

    df = spark.createDataFrame([(1, [1, 2])], "rid long, arr array<int>")
    with pytest.raises(ValueError, match="monotone double surrogate"):
        sampling.global_rank(df, [F.col("arr"), F.col("rid")])


def test_lsh_planes_distinct_and_non_constant(spark):
    """Regression: the old mod-7 weights made planes 0 and 7 the identical
    CONSTANT -2, so bucket bits 0 and 7 never differed and only half the
    buckets were reachable."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.similarity import _plane_weight

    df = spark.range(1).select(
        *[F.array(*[_plane_weight(p)(F.lit(i)) for i in range(12)]).alias(f"p{p}")
          for p in range(8)]
    )
    rows = df.collect()[0]
    weights = [tuple(rows[f"p{p}"]) for p in range(8)]
    assert len(set(weights)) == 8            # pairwise distinct planes
    assert all(len(set(w)) > 1 for w in weights)  # none constant


def test_bucketed_write_prunes_partitions(spark, tmp_path):
    """The stored-bucket probe must be a partition-pruned scan: writing
    partitioned by bucket and querying via bucket_col yields a plan whose
    partition filters carry the bucket predicate, and the results equal
    the derived-expression path."""
    import math

    rows = [(i, [math.sin(i * 0.9 + d) for d in range(5)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "bucketed")
    similarity.write_bucketed_embeddings(df, path, num_planes=4)

    stored = spark.read.parquet(path)
    q = rows[7][1]
    via_stored = similarity.lsh_topk(stored, q, k=5, num_planes=4, bucket_col="bucket")
    via_derived = similarity.lsh_topk(df, q, k=5, num_planes=4)
    assert ([(r.vec_id, r.cosine) for r in via_stored.collect()]
            == [(r.vec_id, r.cosine) for r in via_derived.collect()])
    plan = via_stored._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must be INSIDE the PartitionFilters bracket —
    # appearing merely in the adjacent PushedFilters would mean the bucket
    # regressed to a data column and no partitions are pruned
    inside = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in inside


def test_mlp_udf_null_and_ragged_vectors_score_null(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators

    df = spark.createDataFrame(
        [(1, [0.1] * 8), (2, None), (3, [0.2] * 3)],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r.s for r in df.select(
        "vec_id", annotators.mlp_score_udf(8)(F.col("embedding")).alias("s")).collect()}
    assert out[1] is not None and 0.0 < out[1] < 1.0
    assert out[2] is None and out[3] is None  # NULL/ragged -> NULL, not a crash


def test_balanced_sample_float_and_null_labels(spark):
    """Float labels must not be dropped by driver-side key rendering
    (str(0.1) != Spark's cast-to-string), and NULL labels are a class."""
    rows = [(i, [0.1, 2.5, None][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, label double")
    out = sampling.balanced_sample(df, "label", F.col("id"))
    counts = {r.label: r["count"] for r in out.groupBy("label").count().collect()}
    assert set(counts.values()) == {10}
    assert set(counts.keys()) == {0.1, 2.5, None}


def test_temperature_mix_downweights_big_sources(spark):
    # source "big" 10x the size of "small": keep rate 0.5 for big,
    # min(1, 0.5*sqrt(10)) = 1.0 for small
    rows = [(i, "big") for i in range(200)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.temperature_mix(df, "source", F.col("doc_id"), base_rate=0.5)
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts["small"] == 20                 # rate capped at 1: all kept
    assert 60 <= counts["big"] <= 140            # ~0.5 of 200, hash-binomial


def test_token_budget_cap_matches_naive_window(spark):
    """Bucketed two-phase impl must keep EXACTLY the rows of the naive
    per-group cumulative window, on skewed token counts."""
    from pyspark.sql import Window
    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash

    rows = [(i, "a" if i % 3 else "b", (i * 7) % 50 + 1) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, grp string, n int")
    got = sorted(r.id for r in sampling.token_budget_cap(
        df, "grp", F.col("n"), 300, F.col("id"), num_buckets=7).collect())
    w = (Window.partitionBy("grp").orderBy(salted_hash(F.col("id")), F.col("id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = df.withColumn("__c", F.sum("n").over(w)).filter(F.col("__c") <= 300)
    want = sorted(r.id for r in naive.collect())
    assert got == want and 0 < len(want) < 120   # the cap actually bites


def test_token_budget_cap_zero_token_rows_at_boundary(spark):
    """A zero-token row whose inclusive running sum lands exactly ON the
    budget must be kept — compare against the naive window, which a
    `<`-for-`<=` regression would diverge from."""
    from pyspark.sql import Window
    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash

    rows = [(1, "g", 10), (2, "g", 0), (3, "g", 5)]
    df = spark.createDataFrame(rows, "id long, grp string, n int")
    got = sorted(r.id for r in sampling.token_budget_cap(
        df, "grp", F.col("n"), 10, F.col("id"), num_buckets=2).collect())
    w = (Window.partitionBy("grp").orderBy(salted_hash(F.col("id")), F.col("id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = sorted(r.id for r in
                  df.withColumn("__c", F.sum("n").over(w))
                    .filter(F.col("__c") <= 10).collect())
    assert got == want and len(want) >= 1


def test_compression_ratio_orders_repetitive_below_prose(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import annotators as ann

    rows = [
        (1, "spam " * 200),                       # highly repetitive
        (2, "The quick brown fox jumps over the lazy dog while seventeen "
            "magistrates deliberate obscure zoning variances downtown."),
        (3, ""),                                   # empty -> NULL ratio
        (4, None),                                 # NULL text -> NULLs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.raw_bytes, r.ratio)
           for r in ann.compression_ratio(df).collect()}
    assert got[1][1] < 0.1 < got[2][1]            # repetition compresses hard
    assert got[2][1] < 1.5                        # prose still compresses-ish
    assert got[3] == (0, None) and got[4] == (None, None)
    # deterministic across invocations
    again = {r.doc_id: r.ratio for r in ann.compression_ratio(df).collect()}
    assert again[1] == got[1][1] and again[2] == got[2][1]


def test_keyed_rank_matches_naive_window(spark):
    """keyed_rank == row_number() OVER (PARTITION BY key ORDER BY ...)
    exactly, across range boundaries, for every key — including a key
    concentrated in one range and NULLs in the primary order column
    (ASC NULLS FIRST semantics)."""
    import random

    from pyspark.sql import Window

    rng = random.Random(11)
    rows = [(i, ["a", "b", "c"][i % 3],
             None if i % 17 == 0 else rng.randrange(0, 1000))
            for i in range(300)]
    # key 'z' concentrated in a narrow value band: still correct
    rows += [(1000 + i, "z", 500 + (i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "rid long, k string, v long")
    order = [F.col("v"), F.col("rid")]
    naive = {(r.rid, r.pos) for r in df.withColumn(
        "pos", F.row_number().over(
            Window.partitionBy("k").orderBy(*order)).cast("long")).collect()}
    got = {(r.rid, r.pos)
           for r in sampling.keyed_rank(df, ["k"], order, num_ranges=6)
           .select("rid", "pos").collect()}
    assert got == naive
    # determinism: a second evaluation assigns identical positions
    again = {(r.rid, r.pos)
             for r in sampling.keyed_rank(df, ["k"], order, num_ranges=6)
             .select("rid", "pos").collect()}
    assert again == naive


def test_keyed_rank_parallelism_shape(spark):
    """The construction's point: the in-range window partitions by
    (key, __pid), so the plan's Window sort runs over num_ranges x keys
    partitions, not one per key — assert the window spec includes the
    range id alongside the key."""
    df = spark.createDataFrame(
        [(i, "only_key", i * 7 % 100) for i in range(100)],
        "rid long, k string, v long")
    out = sampling.keyed_rank(df, ["k"], [F.col("v"), F.col("rid")],
                              num_ranges=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__pid" in plan  # the range id reaches the window partitioning
    got = [r.pos for r in out.orderBy("pos").collect()]
    assert got == list(range(1, 101))


def test_keyed_window_suite_matches_naive(spark):
    """keyed_window_suite == the five naive window functions exactly —
    across range boundaries, for every key, including keys smaller than
    the tile count, a key concentrated in one range, and NULLs in the
    value column (sum-ignores-nulls frame semantics)."""
    import random

    from pyspark.sql import Window

    rng = random.Random(23)
    rows = [(i, ["a", "b", "c"][i % 3],
             None if i % 13 == 0 else float(rng.randrange(0, 100)))
            for i in range(400)]
    rows += [(2000 + i, "tiny", float(i)) for i in range(3)]   # n < n_tiles
    rows += [(3000 + i, "z", 500.0 + (i % 2)) for i in range(40)]  # dense key
    df = spark.createDataFrame(rows, "rid long, k string, v double")
    order = [F.col("v"), F.col("rid")]  # plain asc columns (NULLS FIRST
    # is Spark's default; SortOrder wrappers are not valid rank inputs)
    w = Window.partitionBy("k").orderBy(*order)
    wf = w.rowsBetween(-2, Window.currentRow)
    naive = df.select(
        "rid",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.lead("rid").over(w).alias("next_rid"),
        F.sum("v").over(wf).alias("moving_sum"),
    )
    got = sampling.keyed_window_suite(
        df, ["k"], order, value_col="v", lead_col="rid", n_tiles=4,
        num_ranges=7,
    ).select("rid", "rn", "quartile", "pct_rank", "next_rid", "moving_sum")
    nd = {r.rid: tuple(r)[1:] for r in naive.collect()}
    gd = {r.rid: tuple(r)[1:] for r in got.collect()}
    assert set(nd) == set(gd)
    for rid in nd:
        assert gd[rid] == nd[rid], (rid, gd[rid], nd[rid])


def test_quantize_embeddings_codes_scale_and_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.54, 0.0, -2.54])],
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in similarity.quantize_embeddings(df).collect()}
    # schema: tinyint codes (the 4x-smaller storable layout)
    qf = [f for f in similarity.quantize_embeddings(df).schema.fields
          if f.name == "qvec"][0]
    assert "tinyint" in qf.dataType.simpleString()
    # max-magnitude element always codes to +-127; scale = max|x|/127
    assert list(out[1].qvec) == [64, -127, 32]  # 0.5/(1/127)=63.5 -> 64
    assert abs(out[1].qscale - 1.0 / 127) < 1e-9
    assert list(out[3].qvec) == [127, 0, -127]
    # zero vector: scale 0, zero codes (not NULL, not a crash)
    assert list(out[2].qvec) == [0, 0, 0] and out[2].qscale == 0.0
    # dequantization error bound: |x - q*scale| <= scale/2
    for vid, vec in ((1, [0.5, -1.0, 0.25]), (3, [2.54, 0.0, -2.54])):
        sc = out[vid].qscale
        for x, qc in zip(vec, out[vid].qvec):
            assert abs(x - qc * sc) <= sc / 2 + 1e-9


def test_quantized_topk_tracks_float_topk(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(v) for v in
            e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = e.filter(F.col("vec_id") != 0)
    qt = similarity.quantized_topk(corpus, qvec, k=10).collect()
    bf = similarity.brute_force_topk(corpus, qvec, k=10).collect()
    overlap = len({r.vec_id for r in qt} & {r.vec_id for r in bf})
    assert overlap >= 8  # measured 10/10; int8 error is ~2e-3 on cosine
    # quantized score stays within 1% of the exact cosine corpus-wide
    qlit = F.array(*[F.lit(v) for v in qvec])
    exact = corpus.select("vec_id",
                          cosine_similarity(F.col("embedding"), qlit).alias("c"))
    # NOT a huge sentinel k: TakeOrderedAndProject's bounded queue
    # preallocates k slots, so k=1e9 is a multi-GB allocation
    allq = similarity.quantized_topk(corpus, qvec, k=int(corpus.count()))
    merr = (allq.join(exact, "vec_id")
            .agg(F.max(F.abs(F.col("qcos") - F.col("c"))).alias("m"))
            .collect()[0].m)
    assert merr <= 0.01


def test_mine_hard_negatives_matches_naive_window(spark):
    import pytest as _pytest

    from pyspark.sql import Window as W

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 5), 1.0])
            for i in range(1, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [5, 17]
    got = sorted(
        (r.query_id, r.cand_id, r.rank, r.role) for r in
        similarity.mine_hard_negatives(df, qids, pos_k=1, neg_start=3,
                                       neg_end=5).collect())
    # naive twin: full per-query rank window
    from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import cosine_similarity
    q = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    sc = (df.crossJoin(q).filter(F.col("vec_id") != F.col("qid"))
          .select("qid", "vec_id",
                  F.round(cosine_similarity(F.col("embedding"),
                                            F.col("qv")), 6).alias("c")))
    w = W.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    naive = sc.withColumn("rk", F.row_number().over(w)).filter(
        "rk <= 1 or rk between 3 and 5").collect()
    want = sorted((r.qid, r.vec_id, r.rk, "pos" if r.rk <= 1 else "neg")
                  for r in naive)
    assert got == want
    with _pytest.raises(ValueError, match="max_queries"):
        similarity.mine_hard_negatives(df, list(range(10)), max_queries=5)


def test_mine_hard_negatives_bucketed_within_cluster(spark):
    # two tight clusters; queries rank only their own cluster
    rows = [(i, [1.0 + i * 0.01, 0.0]) for i in range(1, 10)]
    rows += [(100 + i, [0.0, 1.0 + i * 0.01]) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = similarity.mine_hard_negatives_bucketed(
        df, [5, 103], cents, pos_k=1, neg_start=2, neg_end=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    # every candidate stays inside the query's cluster
    assert all(r.cand_id < 100 for r in by_q[5])
    assert all(r.cand_id >= 100 for r in by_q[103])
    # rank bands: one pos (rank 1) + negs at ranks 2..3
    for q in (5, 103):
        ranks = sorted(r.rank for r in by_q[q])
        assert ranks == [1, 2, 3]
        roles = {r.rank: r.role for r in by_q[q]}
        assert roles[1] == "pos" and roles[2] == roles[3] == "neg"
    # plan: equi-join on list_id, never a nested-loop fan-out
    plan = similarity.mine_hard_negatives_bucketed(
        df, [5], cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_token_budget_cap_absent_group_keeps_nothing(spark):
    """ADVICE r8: with per-group budgets, a group ABSENT from the map
    keeps nothing in BOTH cardinality branches — before the fix the
    bucketed branch admitted absent groups' zero-token rows (bud=0.0,
    acc <= bud on the first bucket) while the >max_map_entries branch
    inner-joined them away."""
    rows = [(1, "known", 5), (2, "known", 0), (3, "ghost", 0),
            (4, "ghost", 7)]
    df = spark.createDataFrame(rows, "id long, grp string, n int")
    budgets = {"known": 100.0}
    small = sorted(r.id for r in sampling.token_budget_cap(
        df, "grp", F.col("n"), 0, F.col("id"), num_buckets=2,
        budgets=budgets).collect())
    big = sorted(r.id for r in sampling.token_budget_cap(
        df, "grp", F.col("n"), 0, F.col("id"), num_buckets=2,
        budgets=budgets, max_map_entries=1).collect())
    assert small == [1, 2]          # ghost keeps nothing, zero-token incl.
    assert big == small             # branches agree on the contract
