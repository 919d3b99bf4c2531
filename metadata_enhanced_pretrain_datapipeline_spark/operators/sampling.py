"""Sampling / ordering / replication operators (SURVEY.md §2.7-2.8).

Determinism policy: anything oracle-checked orders/samples by a portable
hash of a stable key (functions/hashing.py), never by `rand()` — rerun- and
engine-stable, and shuffle-free where a predicate suffices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import MD5_SPACE, salted_hash


def deterministic_shuffle(df: DataFrame, key: Column, salt: int = 42) -> DataFrame:
    """O3 — reference shuffles with a seeded RNG
    (paradocs.py:165 `sample(frac=1, random_state=42)`); we order by a
    salted hash of the key: same permutation everywhere. One range-shuffle,
    same cost as orderBy(rand()) but reproducible."""
    return df.orderBy(salted_hash(key, salt), key)


def positional_split(df: DataFrame, key: Column, train_frac: float,
                     tag_col: str = "split") -> DataFrame:
    """O5 — train/test split by position (reference code_processing.py:160-163).

    Position = rank by hash order (deterministic shuffle), computed with
    the scalable two-phase global_rank — no single-task window sort.
    """
    # global_rank already counts every range — reuse its total instead of
    # paying a fourth full scan for df.count()
    ranked, n = global_rank(df, [salted_hash(key), key], "__rank", with_total=True)
    cut = int(n * train_frac)
    return ranked.withColumn(
        tag_col, F.when(F.col("__rank") <= F.lit(cut), "train").otherwise("test")
    ).drop("__rank")


def balanced_sample(df: DataFrame, label_col: str, key: Column,
                    num_buckets: int | None = None,
                    max_map_entries: int = 65536) -> DataFrame:
    """F15 — downsample every class to the minority-class size
    (reference preprocessing.py:37-40).

    Deterministic AND scale-safe: keep the first `min_count` rows per
    class under the (salted_hash(key), key) order — identical output to a
    per-class row_number window (oracle-checked), but WITHOUT putting an
    entire class through one task's sort. The 60-bit hash is range-split
    into `num_buckets` monotone buckets; one (label, bucket) count agg
    gives driver-side per-bucket offsets (n_labels x num_buckets scalars),
    the in-bucket window adds the offset, and — the scale win — buckets
    whose offset is already >= min_count are dropped BEFORE the window
    shuffle, so the sort touches ~min_count rows per class no matter how
    big the majority class is.

    Ties are exact: equal hashes share a bucket (same value -> same
    bucket) and the in-bucket order includes `key` itself; bucket id is
    monotone in the hash, so cross-bucket order is the global hash order.

    If the (label, bucket) count exceeds `max_map_entries` (very many
    classes), classes are necessarily small and the simple per-class
    window is the better plan — fall back to it.
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    nb = int(num_buckets or spark.sparkContext.defaultParallelism)
    width = MD5_SPACE // nb + 1  # ceil: hash < 2^60 -> bucket in [0, nb)
    # double division then floor is monotone in the hash, and equal hashes
    # always agree — boundary rounding shifts a row's bucket consistently,
    # never its rank (offsets come from actual per-bucket counts).
    keyed = df.withColumn("__h", salted_hash(key)).withColumn(
        "__b", F.floor(F.col("__h") / F.lit(float(width))).cast("int"))
    # limit BEFORE collect: with very many classes the unbounded collect
    # would OOM the driver in exactly the regime the fallback exists for —
    # the probe caps driver memory at max_map_entries+1 rows either way
    cnt_rows = (
        keyed.groupBy(label_col, "__b").agg(F.count("*").alias("__c"))
        .limit(max_map_entries + 1).collect()
    )
    if not cnt_rows:
        return df.filter(F.lit(False))
    if len(cnt_rows) > max_map_entries:
        w = Window.partitionBy(label_col).orderBy(salted_hash(key), key)
        counts = df.groupBy(label_col).count()
        min_count = counts.agg(F.min("count").alias("__m"))
        ranked = df.withColumn("__rk", F.row_number().over(w))
        return (
            ranked.crossJoin(F.broadcast(min_count))
            .filter(F.col("__rk") <= F.col("__m"))
            .drop("__rk", "__m")
        )
    per: dict = {}
    for r in cnt_rows:
        per.setdefault(r[0], {})[r["__b"]] = r["__c"]
    min_count = min(sum(bs.values()) for bs in per.values())
    # Offsets ship back as a BROADCAST JOIN table, not a create_map keyed
    # by string rendering: the collected label values round-trip through
    # createDataFrame with the ORIGINAL label type, so equality is exact
    # for every type (a str(lab) map key diverges from Spark's
    # cast-to-string for float/double/decimal — '0.10000000149011612' vs
    # '0.1' — silently dropping whole classes). Only buckets that can
    # still contribute (offset < min_count) get a row, so the join also
    # prunes dead buckets before the window shuffle.
    entries = []
    for lab, bs in per.items():
        acc = 0
        for b in sorted(bs):
            if acc < min_count:
                entries.append((lab, b, acc))
            acc += bs[b]
    off_schema = StructType([
        df.schema[label_col],
        StructField("__b", IntegerType()),
        StructField("__off", LongType()),
    ])
    offsets = spark.createDataFrame(
        [(lab, b, off) for lab, b, off in entries], off_schema
    ).withColumnRenamed(df.schema[label_col].name, "__lab")
    live = keyed.join(
        F.broadcast(offsets),
        F.col(label_col).eqNullSafe(F.col("__lab")) & (keyed["__b"] == offsets["__b"]),
    ).drop("__lab", offsets["__b"])
    w = Window.partitionBy(label_col, "__b").orderBy("__h", key)
    ranked = live.withColumn("__rk", F.row_number().over(w) + F.col("__off"))
    return ranked.filter(F.col("__rk") <= F.lit(min_count)).drop(
        "__h", "__b", "__off", "__rk")


def replicate_buckets(df: DataFrame, reps: Column, keep_rep_index: bool = False) -> DataFrame:
    """U2 — replicate each row k times, k per-row (reference gutenberg
    create_replicas.py:38-96: repetition schedule over buckets of 500).

    `explode(sequence(1, k))` — fan-out without shuffle; output partition
    sizes grow by the local replication factor, so follow with a
    repartition if k is large and skewed.
    """
    # sequence(1, 0) descends to [1, 0]; k <= 0 must DROP the row (an
    # empty array explodes to zero rows)
    seq = F.when(reps >= 1, F.sequence(F.lit(1), reps)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.withColumn("__rep", F.explode(seq))
    return out if keep_rep_index else out.drop("__rep")


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O6 — deterministic top-k. Spark plans orderBy+limit as TakeOrdered:
    per-partition partial top-k then a single-reduce merge — no full sort
    at scale."""
    return df.orderBy(*order).limit(k)


def global_rank(df: DataFrame, order: list[Column], rank_col: str = "pos",
                num_ranges: int | None = None, with_total: bool = False):
    """Scalable global ranking: 1..N positions under a total order WITHOUT
    the single-task sort of an unpartitioned row_number() window.

    Three cheap phases: (1) approx-quantile the primary order column and
    collect the range boundaries as PLAN LITERALS, (2) count rows per
    range (one agg) to build the broadcast offset map, (3) row_number
    within each range + offset. Because the boundaries are literals, every
    re-execution assigns identical ranges — deterministic with no
    persist/cache (a repartitionByRange+spark_partition_id formulation
    would resample boundaries per job, forcing a MEMORY_AND_DISK persist
    of the full dataset that leaked across calls and is itself a scale
    problem at 100 TB). Results identical to the naive window (tested).

    The primary order column must be an ASCENDING column expression whose
    ordering a numeric key can mirror: numerics cast to double
    monotonically (the engine's determinism policy orders by 60-bit
    hashes), and strings use their first 7 bytes (Spark compares strings
    bytewise, so the prefix is order-consistent). Rows whose keys collide
    share a range and are split by the in-range window over the full
    ``order``, so precision loss cannot misrank. The input is scanned
    three times (quantiles, counts, ranking) — persist upstream first if
    it is expensive to recompute rather than a pruned file scan.
    """
    spark = df.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism
    primary_type = df.select(order[0].alias("__k")).schema[0].dataType.simpleString()
    if primary_type == "string":
        # order-preserving numeric surrogate: first 7 BYTES of the UTF-8
        # encoding, zero-padded to fixed width. 56 bits exceeds a double's
        # 53-bit mantissa, so the low ~3 bits round — but rounding a
        # monotone map is still monotone, and keys that collide after
        # rounding just share a range and are split exactly by the
        # in-range window over the full `order`. Fixed width matters:
        # variable-length prefixes compare as integers by magnitude, not
        # bytewise ('alphaz' > 'alpho' would misorder). Spark compares
        # strings bytewise, so this mirrors it.
        key = F.conv(
            F.hex(F.substring(
                F.concat(F.encode(order[0], "UTF-8"), F.lit(bytes(7))), 1, 7)),
            16, 10,
        ).cast("double")
    elif primary_type == "date":
        key = F.unix_date(order[0]).cast("double")
    elif primary_type.startswith("timestamp"):
        # unix_micros is monotone in the timestamp; |micros| < 2^63 but
        # realistic epochs fit a double's 53-bit mantissa to ~microsecond;
        # rounding collisions fall back to the in-range window like strings
        key = F.unix_micros(order[0].cast("timestamp")).cast("double")
    elif primary_type in ("tinyint", "smallint", "int", "bigint", "float",
                          "double", "boolean") or primary_type.startswith("decimal"):
        key = order[0].cast("double")
    else:
        raise ValueError(
            f"global_rank needs a primary order column with a monotone "
            f"double surrogate; got {primary_type!r} — cast it or order by "
            f"a numeric/string/date/timestamp expression first"
        )
    qs = [i / num_ranges for i in range(1, num_ranges)]
    bounds = sorted(set(
        df.select(key.alias("__k")).approxQuantile("__k", qs, 0.001)
    )) if qs else []
    # single array expression, not a when-chain: a chain of thousands of
    # when() terms would blow the 64KB codegen method limit at cluster
    # parallelism; filter-over-literal-array stays one vectorized op.
    # __key is materialized as a column so the lambda compares against it
    # instead of re-evaluating the key expression per array element.
    keyed = df.withColumn("__key", key)
    bounds_arr = F.array(*[F.lit(b) for b in bounds])
    pid = (F.size(F.filter(bounds_arr, lambda b: F.col("__key") >= b))
           if bounds else F.lit(0))
    with_pid = keyed.withColumn("__pid", pid).drop("__key")
    counts = {r["__pid"]: r["cnt"] for r in
              with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    omap = F.create_map(*[x for p, off in offsets.items()
                          for x in (F.lit(p), F.lit(off))])
    w = Window.partitionBy("__pid").orderBy(*order)
    ranked = (
        with_pid.withColumn(
            rank_col,
            (F.row_number().over(w) + F.coalesce(F.element_at(omap, F.col("__pid")), F.lit(0)))
            .cast("long"),
        ).drop("__pid")
    )
    if with_total:
        return ranked, acc  # total row count — already paid for by the counts job
    return ranked


def temperature_mix(df: DataFrame, source_col: str, key: Column,
                    base_rate: float = 0.5, salt: int = 7) -> DataFrame:
    """Temperature-weighted source rebalancing (the XLM-R/mT5 n^alpha
    mixing rule at alpha = 1/2): per-source keep rate
    ``f_s = min(1, base_rate * sqrt(n_max / n_s))`` — relative rates
    follow n^(alpha-1), so dominant sources downsample hardest and the
    largest source keeps ``base_rate``.

    alpha is pinned to 1/2 ON PURPOSE: sqrt, division and multiplication
    are IEEE-754 exact-rounded, so Spark and a DuckDB oracle derive the
    SAME double threshold bit-for-bit; a general pow(n, alpha) is only
    ~1-ulp accurate per engine and could flip boundary rows. Keep
    decision: salted_hash(key, salt) < f_s * 2^60 — deterministic under
    rerun/retry, which is also the only sane semantics at 100 TB.

    Cost: one tiny per-source agg, broadcast back; the corpus itself
    never shuffles — the keep test is a narrow filter.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    nmax = counts.agg(F.max("__n").alias("__nmax"))
    rates = counts.crossJoin(F.broadcast(nmax)).select(
        F.col(source_col).alias("__src"),
        F.least(
            F.lit(1.0),
            F.lit(float(base_rate)) * F.sqrt(F.col("__nmax") / F.col("__n")),
        ).alias("__f"),
    )
    out = df.join(F.broadcast(rates), F.col(source_col).eqNullSafe(F.col("__src")))
    return out.filter(
        salted_hash(key, salt) < F.col("__f") * F.lit(float(MD5_SPACE))
    ).drop("__src", "__f")


def token_budget_cap(df: DataFrame, group_col: str, tokens_col: Column,
                     budget: int, key: Column,
                     num_buckets: int | None = None,
                     max_map_entries: int = 65536) -> DataFrame:
    """Per-group token budget: keep rows in (salted_hash(key), key)
    priority order while the group's running INCLUSIVE token sum stays
    <= ``budget`` — the per-domain/per-language token-cap pass of a
    pretraining mix.

    Scale shape mirrors :func:`balanced_sample`: the hash space is
    range-split into monotone buckets, one (group, bucket) token-sum agg
    gives driver-side cumulative offsets (tiny), buckets whose offset
    already exceeds the budget are pruned BEFORE the window shuffle, and
    the in-bucket cumulative sum adds the offset — identical output to
    the naive per-group running-sum window (oracle-checked) without ever
    sorting a whole group in one task.
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    nb = int(num_buckets or spark.sparkContext.defaultParallelism)
    width = MD5_SPACE // nb + 1
    keyed = df.withColumn("__t", tokens_col.cast("long")).withColumn(
        "__h", salted_hash(key)
    ).withColumn("__b", F.floor(F.col("__h") / F.lit(float(width))).cast("int"))
    cnt_rows = (
        keyed.groupBy(group_col, "__b").agg(F.sum("__t").alias("__s"))
        .limit(max_map_entries + 1).collect()
    )
    if not cnt_rows:
        return df.filter(F.lit(False))
    if len(cnt_rows) > max_map_entries:
        w = (Window.partitionBy(group_col).orderBy("__h", key)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        cum = keyed.withColumn("__cum", F.sum("__t").over(w))
        return cum.filter(F.col("__cum") <= F.lit(budget)).drop(
            "__t", "__h", "__b", "__cum")
    per: dict = {}
    for r in cnt_rows:
        per.setdefault(r[0], {})[r["__b"]] = r["__s"]
    entries = []
    for grp, bs in per.items():
        acc = 0
        for b in sorted(bs):
            # offset > budget can't contribute (token counts are >= 0;
            # == budget still admits zero-token rows)
            if acc <= budget:
                entries.append((grp, b, acc))
            # sum() over an all-NULL bucket (every row's token expr NULL)
            # collects as None — treat as contributing nothing
            acc += bs[b] or 0
    off_schema = StructType([
        df.schema[group_col],
        StructField("__b", IntegerType()),
        StructField("__off", LongType()),
    ])
    offsets = spark.createDataFrame(
        [(g, b, off) for g, b, off in entries], off_schema
    ).withColumnRenamed(df.schema[group_col].name, "__grp")
    live = keyed.join(
        F.broadcast(offsets),
        F.col(group_col).eqNullSafe(F.col("__grp")) & (keyed["__b"] == offsets["__b"]),
    ).drop("__grp", offsets["__b"])
    w = (Window.partitionBy(group_col, "__b").orderBy("__h", key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = live.withColumn("__cum", F.sum("__t").over(w) + F.col("__off"))
    return cum.filter(F.col("__cum") <= F.lit(budget)).drop(
        "__t", "__h", "__b", "__off", "__cum")


def leakage_safe_split(df: DataFrame, clusters: DataFrame,
                       id_col: str = "doc_id",
                       boundaries: tuple[float, float] = (0.9, 0.95),
                       labels: tuple[str, str, str] = ("train", "validation", "test"),
                       salt: int = 13,
                       tag_col: str = "split") -> DataFrame:
    """Train/validation/test assignment that can never leak near
    duplicates across splits: the split unit is the document's duplicate
    CLUSTER (``clusters`` = (doc_id, cluster_id) from
    :func:`~metadata_enhanced_pretrain_datapipeline_spark.operators.dedup.duplicate_clusters`),
    falling back to the document's own id for singletons — so an
    eval-set document's near-twin cannot sit in train (the contamination
    mode a per-document hash split invites, and the reason a plain
    :func:`positional_split` is unsafe after fuzzy dedup).

    Assignment is ``salted_hash(unit, salt)`` against integer thresholds
    ``floor(b * 2^60)`` — deterministic under rerun/retry, and exact in
    both engines (no float division). Adding a document to the corpus
    never moves any OTHER document between splits (hash-stable, unlike
    rank-based splits).

    Scale: one id-only left join against the cluster map (ids of docs
    that appear in any candidate pair — a small fraction of the corpus;
    AQE broadcasts it when it fits) plus a projection. The corpus text
    never shuffles.
    """
    lo = int(boundaries[0] * MD5_SPACE)
    hi = int(boundaries[1] * MD5_SPACE)
    cl = clusters.select(
        F.col("doc_id").alias("__cl_id"), F.col("cluster_id").alias("__cid")
    )
    out = df.join(cl, F.col(id_col) == F.col("__cl_id"), "left").drop("__cl_id")
    unit = F.coalesce(F.col("__cid"), F.col(id_col))
    h = salted_hash(unit, salt)
    return out.select(
        *[F.col(c) for c in df.columns],
        unit.cast("long").alias("split_key"),
        F.when(h < F.lit(lo), labels[0])
        .when(h < F.lit(hi), labels[1])
        .otherwise(labels[2])
        .alias(tag_col),
    )


def per_host_cap(df: DataFrame, host_col: str, k: int, key: Column,
                 num_buckets: int | None = None) -> DataFrame:
    """Per-host document cap (RefinedWeb-style domain balancing): keep at
    most ``k`` documents per host, chosen by deterministic hash priority
    — a uniform within-host sample that caps crawl-frequency bias
    (one forum mirror must not be 10% of the mix).

    This IS :func:`token_budget_cap` with a unit token count: running
    inclusive count <= k in (hash, key) order — so it inherits the
    bucketed two-phase shape (per-(host, bucket) counts -> broadcast
    offsets -> in-bucket window) and never sorts a whole mega-host in a
    single task, which is exactly where a naive per-host row_number
    window dies at 100 TB.
    """
    return token_budget_cap(df, host_col, F.lit(1), k, key,
                            num_buckets=num_buckets)
