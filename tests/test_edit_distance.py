"""Edit-distance near-dup: LSH candidates + thresholded-Levenshtein verify."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (1, base),
        (2, base + " xx"),          # 3 edits from 1
        (3, base.replace("quick", "quacks")),  # 2 edits from 1 (sub + insert)
        (4, "completely different words about spark shuffles and parquet scans here"),
        (5, base),                  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_pairs_and_distances(spark):
    df = _corpus(spark)
    out = {(r.id_a, r.id_b): r.edit_distance
           for r in edit_distance_pairs(df, max_edits=4, num_hashes=8,
                                        bands=8, portable=True).collect()}
    # bands=8 with 1 row/band: near-identical docs must collide somewhere
    assert out[(1, 5)] == 0
    assert out[(1, 2)] == 3
    assert out[(1, 3)] == 2
    assert all(a < b for a, b in out)
    # doc 4 shares no shingles — never a candidate
    assert not any(4 in p for p in out)


def test_threshold_excludes(spark):
    df = _corpus(spark)
    out = {(r.id_a, r.id_b): r.edit_distance
           for r in edit_distance_pairs(df, max_edits=1, num_hashes=8,
                                        bands=8, portable=True).collect()}
    assert (1, 5) in out and out[(1, 5)] == 0
    assert (1, 2) not in out  # distance 3 > 1
    assert (1, 3) not in out  # distance 2 > 1


def test_distances_match_reference_dp(spark):
    df = _corpus(spark)
    texts = {r.doc_id: r.text for r in df.collect()}
    for r in edit_distance_pairs(df, max_edits=10, num_hashes=8,
                                 bands=8, portable=True).collect():
        assert r.edit_distance == _lev(texts[r.id_a], texts[r.id_b])


def test_rejected_pair_costs_banded_dp_not_full_matrix(spark):
    # functional check of the -1 contract on long inputs
    a, b = "a" * 6000, "b" * 6000
    df = spark.createDataFrame([(a, b)], "x string, y string")
    assert df.select(F.levenshtein("x", "y", 2).alias("d")).head().d == -1
