"""Product quantization: pq_fit / pq_encode / pq_adc_topk.

Hand-computed codes and ADC scores on tiny codebooks; the full
engine-vs-SQL replay lives in q_pq_adc_topk's oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity

#: m=2 subspaces of dim 2, ksub=2 centroids each
CBS = [
    [[0.0, 0.0], [10.0, 10.0]],
    [[5.0, 0.0], [0.0, 5.0]],
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(1, [9.0, 9.0, 4.0, 1.0]), (2, [1.0, -1.0, 0.0, 6.0])],
        "vec_id long, embedding array<float>")


def test_pq_encode_codes_and_dtype(vecs):
    out = similarity.pq_encode(vecs, CBS).orderBy("vec_id")
    assert dict(out.dtypes)["pq_codes"] == "array<tinyint>"
    rows = out.collect()
    # vec 1: subspace (9,9)->closest (10,10)=code 1; (4,1)->closest (5,0)
    assert list(rows[0].pq_codes) == [1, 0]
    # vec 2: (1,-1)->(0,0); (0,6)->(0,5)
    assert list(rows[1].pq_codes) == [0, 1]


def test_pq_encode_tie_breaks_to_smaller_code(spark):
    df = spark.createDataFrame([(1, [1.0, 1.0])],
                               "vec_id long, embedding array<float>")
    cbs = [[[0.0, 0.0], [2.0, 2.0]]]  # equidistant from (1,1)
    [r] = similarity.pq_encode(df, cbs).collect()
    assert list(r.pq_codes) == [0]


def test_pq_adc_score_is_dot_of_reconstruction(vecs):
    codes = similarity.pq_encode(vecs, CBS)
    q = [1.0, 2.0, 3.0, 4.0]
    got = {r.vec_id: r.adc_score
           for r in similarity.pq_adc_topk(codes, CBS, q, k=10).collect()}
    # vec 1 reconstructs to [10,10,5,0] -> 10+20+15+0
    assert got[1] == pytest.approx(45.0)
    # vec 2 reconstructs to [0,0,0,5] -> 20
    assert got[2] == pytest.approx(20.0)


def test_pq_shape_guards(vecs):
    with pytest.raises(ValueError, match="tinyint"):
        similarity.pq_encode(vecs, [[[0.0]] * 128])
    with pytest.raises(ValueError, match="query dim"):
        similarity.pq_adc_topk(vecs.withColumn("pq_codes", F.array()),
                               CBS, [1.0, 2.0])
    with pytest.raises(ValueError, match="ragged"):
        similarity.pq_encode(vecs, [[[0.0, 0.0]], [[0.0]]])


def test_pq_fit_shapes_and_roundtrip(spark):
    rows = [(i, [float(i % 4), float((i * 7) % 5),
                 float((i * 3) % 4), float(i % 3)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cbs = similarity.pq_fit(df, m=2, ksub=3, iters=2)
    assert len(cbs) == 2 and all(len(sub) == 3 for sub in cbs)
    assert all(len(c) == 2 for sub in cbs for c in sub)
    top = similarity.pq_adc_topk(similarity.pq_encode(df, cbs), cbs,
                                 [1.0, 1.0, 1.0, 1.0], k=5)
    assert top.count() == 5


def test_pq_fit_dim_not_divisible_raises(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_fit(df, m=2, ksub=2)


def test_ivfpq_store_roundtrip_and_stamp(spark, tmp_path):
    rows = [(i, [float((i * 13 + d * 7) % 9) - 4.0 for d in range(4)])
            for i in range(32)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    coarse = [r.embedding and [float(x) for x in r.embedding]
              for r in df.filter(F.col("vec_id") < 2).orderBy("vec_id").collect()]
    cbs = [[c[j * 2:(j + 1) * 2] for c in coarse] for j in range(2)]
    path = str(tmp_path / "ivfpq")
    similarity.write_ivfpq_store(df, path, coarse, cbs)
    back = spark.read.parquet(path)
    assert set(back.columns) == {"vec_id", "pq_codes", "list_id"}
    assert back.schema["pq_codes"].metadata[
        similarity.PQ_CODEBOOK_METADATA_KEY] == similarity.ivfpq_digest(
            coarse, cbs)
    top = similarity.ivfpq_topk(back, coarse, cbs, coarse[0], k=5, nprobe=1)
    got = top.collect()
    assert len(got) == 5
    # nprobe=1 restricts to one list
    probed_ids = {r.vec_id for r in got}
    lists = {r.list_id for r in back.filter(
        F.col("vec_id").isin(list(probed_ids))).collect()}
    assert len(lists) == 1


def test_ivfpq_codebook_mismatch_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<float>")
    coarse = [[0.0, 0.0, 0.0, 0.0], [2.0, 4.0, 1.0, 0.0]]
    cbs = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 0.0]]]
    path = str(tmp_path / "ivfpq2")
    similarity.write_ivfpq_store(df, path, coarse, cbs)
    back = spark.read.parquet(path)
    other = [[9.0, 9.0, 9.0, 9.0], [2.0, 4.0, 1.0, 0.0]]
    with pytest.raises(ValueError, match="different keyspace"):
        similarity.ivfpq_topk(back, other, cbs, [1.0, 0.0, 0.0, 0.0])


def test_ivfpq_score_matches_reconstruction(spark, tmp_path):
    # one list, identity-ish setup: score must equal
    # dot(q, coarse) + dot(q - coarse, recon(residual))
    df = spark.createDataFrame([(1, [3.0, 1.0])],
                               "vec_id long, embedding array<float>")
    coarse = [[2.0, 0.0]]
    cbs = [[[0.0], [1.0]], [[0.0], [1.0]]]  # residual (1,1) -> codes (1,1)
    path = str(tmp_path / "ivfpq3")
    similarity.write_ivfpq_store(df, path, coarse, cbs)
    back = spark.read.parquet(path)
    q = [1.0, 2.0]
    [r] = similarity.ivfpq_topk(back, coarse, cbs, q, k=1, nprobe=1).collect()
    # coarse term = 1*2 + 2*0 = 2; recon residual = [1,1] -> dot(q - coarse
    # ... LUT is dot of (q - coarse)_j with chosen centroid: rq = [-1, 2]
    # lut picks code 1 in both subspaces: (-1*1) + (2*1) = 1; total 3
    assert r.adc_score == pytest.approx(3.0)
