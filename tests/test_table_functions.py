"""Python UDTF surface (operators/table_functions)."""
def test_udtf_excerpt_windows_edges(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators.table_functions import (
        register_table_functions)

    register_table_functions(spark)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None)], "id long, text string"
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.id, w.win_idx, w.excerpt FROM udtf_edge d, "
        "LATERAL excerpt_windows(d.text, 3, 1) w").collect()
    got = {(r.id, r.win_idx): r.excerpt for r in rows}
    # doc 1: three full 3-word windows; doc 2 too short -> 0 rows; NULL -> 0
    assert got == {(1, 0): "a b c", (1, 1): "b c d", (1, 2): "c d e"}
