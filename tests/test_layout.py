"""Z-order layout: Morton key correctness and clustering effect."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import layout


def _interleave(x, y, bits):
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = {(r.x, r.y): r.z for r in df.select(
        "x", "y", layout.zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
    ).collect()}
    for (x, y), z in out.items():
        assert z == _interleave(x, y, 8), (x, y)


def test_zorder_layout_bounds_file_rectangles(spark):
    # 32x32 grid; 16 range partitions -> each partition's (x,y) min-max
    # box must be far smaller than the full grid (the data-skipping win)
    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long")
    laid = layout.zorder_layout(grid, F.col("x"), F.col("y"), 16, bits=5)
    stats = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"),
             F.count("*").alias("n"))
        .collect()
    )
    assert sum(r.n for r in stats) == 1024
    areas = [(r.x1 - r.x0 + 1) * (r.y1 - r.y0 + 1) for r in stats if r.n > 0]
    # every partition's bounding box covers at most a quarter of the grid
    # (a sort on x alone would give full-height slabs; Z gives tiles)
    assert max(areas) <= 32 * 32 / 4
