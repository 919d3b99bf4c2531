"""Aggregations (SURVEY.md §2.5) and the event-time window family.

The one non-trivial reference aggregate is the two-phase threshold
estimation (G1, embeddings_filter.py:74-108 + fineweb/main.py:113-119):
sample → score → quantile → broadcast the scalar into a filter. That
two-job shape is inherent (the threshold must exist before the filter) and
is preserved here; everything else is plain groupBy/agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def estimate_threshold(df: DataFrame, score_col: Column, keep_top_p: float,
                       sample_rate: float | None = None,
                       key: Column | None = None) -> float:
    """G1 — estimate the score cutoff keeping the top ``keep_top_p``
    fraction (reference samples ≤1M rows then np.quantile(scores, 1-p),
    embeddings_filter.py:85-108). Exact percentile on an optional
    deterministic hash-sample; returns a driver-side scalar to broadcast
    into the filter (J4)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.filters import hash_sample

    if sample_rate is not None and key is None:
        raise ValueError(
            "sample_rate needs a stable `key` column to hash-sample on — "
            "without one the estimate would silently run over the full "
            "dataset (an exact-percentile sort at 100 TB)"
        )
    scored = df.select(score_col.alias("__s"), *( [key.alias("__k")] if key is not None else []))
    if sample_rate is not None:
        scored = hash_sample(scored, F.col("__k"), sample_rate)
    row = scored.agg(F.expr(f"percentile(__s, {1 - keep_top_p})").alias("t")).collect()[0]
    if row["t"] is None:
        raise ValueError(
            "threshold undefined: no non-null scores reached the percentile "
            "aggregate (empty input, all-null scores, or a sample_rate that "
            "filtered out every row)"
        )
    return float(row["t"])


def quantile_threshold_filter(df: DataFrame, score_col: Column,
                              keep_top_p: float) -> DataFrame:
    """G1+F6 composed — the fineweb quality gate (fineweb/main.py:113-121):
    estimate the threshold, then keep rows with score > t."""
    t = estimate_threshold(df, score_col, keep_top_p)
    return df.filter(score_col > F.lit(t))


def group_count(df: DataFrame, col: str) -> DataFrame:
    """G3 — value_counts sorted by key (code_processing.py:63-70)."""
    return df.groupBy(col).count().orderBy(col)


def duplicate_counts(df: DataFrame, key: str) -> DataFrame:
    """G4 — ids appearing more than once (create_excerpt.py:184-185
    uniqueness assert as a query)."""
    return df.groupBy(key).agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)


def tumbling_window_agg(df: DataFrame, ts_col: str, keys: list[str],
                        duration: str = "1 hour",
                        aggs: list[Column] | None = None) -> DataFrame:
    """Event-time tumbling window aggregation over the events table —
    `window()` is epoch-aligned, so the batch result matches
    date_trunc-based oracles and the streaming variant
    (streaming/events.py) shares the same expression."""
    aggs = aggs or [F.count("*").alias("n")]
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys).agg(*aggs)
    agg_names = [c for c in out.columns if c not in {"w", *keys}]
    return out.select(F.col("w.start").alias("window_start"), *keys, *agg_names)


def skew_safe_count_distinct(df: DataFrame, key_cols: list[str],
                             value_col: str) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, as the two-shuffle dedup-then-
    count rewrite: groupBy(keys, value) → groupBy(keys) count.

    Why not countDistinct: Spark plans a distinct aggregate via Expand,
    shuffling every (key, value) row to the KEY's partition before
    deduplicating — one hot key (a bot user, an empty-string URL) funnels
    its entire row volume through one task. The rewrite's first shuffle
    keys by (key, value), spreading a hot key over as many partitions as
    it has distinct values, and map-side partial aggregation collapses
    duplicate (key, value) pairs before anything moves. The second
    shuffle carries one row per distinct pair. Same result, skew-bounded.
    NULL values are not counted, matching COUNT(DISTINCT) semantics —
    including keys whose values are ALL NULL, which must still appear
    with n_distinct = 0 (a bare isNotNull pre-filter would silently drop
    the whole group and diverge from countDistinct).
    """
    keys = df.select(*key_cols).distinct()
    dedup = (
        df.filter(F.col(value_col).isNotNull())
        .select(*key_cols, value_col).distinct()
    )
    # the count side renames its keys: both frames share df's lineage, so
    # a keys[k] == counts[k] condition resolves to the SAME attribute (a
    # trivially-true predicate = accidental cross join)
    counts = dedup.groupBy(*key_cols).agg(F.count("*").alias("__n"))
    for k in key_cols:
        counts = counts.withColumnRenamed(k, f"__k_{k}")
    # null-safe join: a NULL key is a group too (GROUP BY semantics)
    cond = None
    for k in key_cols:
        c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
        cond = c if cond is None else (cond & c)
    return (
        keys.join(counts, cond, "left")
        .select(*key_cols,
                F.coalesce(F.col("__n"), F.lit(0)).alias("n_distinct"))
    )


def equi_width_histogram(df: DataFrame, value_col: str,
                         n_bins: int = 10) -> DataFrame:
    """(bin, bin_lo, n) equi-width histogram of a numeric column — the
    distribution profile a curation run records for every quality score.

    Two passes, both trivial: a 1-row (min, max) aggregate broadcast
    back, then the binning projection + one count shuffle. The top edge
    closes via least(bin, n_bins-1) so max lands in the last bin; all
    arithmetic is exact-rounded IEEE ops on identical inputs, hence
    engine-portable bin assignment. Degenerate case lo == hi puts every
    row in bin 0 (width would be 0 — guarded with a NULL-safe floor).
    NULL (and for float columns NaN) values are EXCLUDED up front —
    without the filter a NULL raw_bin would slip through F.least (which
    skips nulls) straight into the top bin as phantom mass.
    """
    df = df.filter(F.col(value_col).isNotNull())
    if dict(df.dtypes).get(value_col) in ("double", "float"):
        df = df.filter(~F.isnan(value_col))
    mm = df.agg(F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(n_bins)
    raw_bin = F.floor((F.col(value_col) - F.col("__lo")) / width)
    bin_col = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(raw_bin, F.lit(n_bins - 1))
    ).cast("int")
    return (
        df.join(F.broadcast(mm))
        .select(bin_col.alias("bin"),
                (F.col("__lo") + bin_col.cast("double")
                 * ((F.col("__hi") - F.col("__lo")) / F.lit(n_bins))).alias("bin_lo"))
        .groupBy("bin", "bin_lo")
        .agg(F.count("*").alias("n"))
    )


def _cm_cell(key: Column, d: Column, width: int) -> Column:
    """Count-Min cell index for ``key`` in depth-row ``d``: the portable
    salted hash (functions/hashing.salted_hash with a per-row salt that
    is a COLUMN, not a literal) mod width. NULL keys count under the
    sentinel like every sampler here — dropping them would silently
    under-count a null-heavy column."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import md5_hash64

    k = F.coalesce(key.cast("string"), F.lit("␀"))
    return md5_hash64(F.concat(k, F.lit("_"), d.cast("string"))) % F.lit(width)


def countmin_sketch(df: DataFrame, key_col: str, width: int = 256,
                    depth: int = 4) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key column:
    ``depth`` independent hash rows of ``width`` counters, returned as a
    (d, bucket, cnt) DataFrame of at most depth×width rows.

    The frequency complement of the existing sketch family (HLL++
    cardinality, quantile digests): point-frequency estimates with a
    one-sided error — estimates never undercount, and overcount by at
    most εN with ε = e/width at the usual depth=ln(1/δ). At 100 TB this
    is THE way to ask "how often does this token/host/url occur"
    without materializing a full frequency table: the corpus collapses
    map-side into depth×width integers (one map-side-combinable groupBy
    on a bounded key space — the shuffle moves ≤ depth×width rows per
    task, regardless of corpus size), and sketches of shards MERGE by
    cell-wise addition, so incremental months fold in without re-scans.

    Portability: cells use the md5 salted hash, so a DuckDB oracle (or a
    different engine's pipeline) reproduces the exact table — estimates
    included — not just the error bound.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}x{depth}")
    depths = F.array([F.lit(i) for i in range(depth)])
    ex = df.select(F.col(key_col).alias("__k")) \
           .select(F.explode(depths).alias("d"), "__k")
    return (ex.select("d", _cm_cell(F.col("__k"), F.col("d"), width)
                      .alias("bucket"))
              .groupBy("d", "bucket").agg(F.count("*").alias("cnt")))


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      width: int, depth: int) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]`` from a
    :func:`countmin_sketch` table built with the same (width, depth):
    min over the key's ``depth`` cells. Keys absent from the corpus read
    whatever their cells collected (possibly 0 via the left join) — the
    one-sided guarantee est >= true still holds.

    Scale: the sketch is at most depth×width rows — broadcast side of
    the join; the probe costs one narrow projection over ``keys``."""
    depths = F.array([F.lit(i) for i in range(depth)])
    # materialize the cell key BEFORE the join — joining on an
    # expression-defined key makes InferFiltersFromConstraints inline it
    # into the other side as an unresolvable !Filter (r7 lesson)
    ex = (keys.select(F.col(key_col))
              .select(key_col, F.explode(depths).alias("d"))
              .select(key_col, "d",
                      _cm_cell(F.col(key_col), F.col("d"), width)
                      .alias("bucket")))
    probed = ex.join(F.broadcast(sketch), ["d", "bucket"], "left") \
               .select(key_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return probed.groupBy(key_col).agg(F.min("cnt").alias("est_cnt"))
