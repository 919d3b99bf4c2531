"""Similarity search over embedding columns (extension; prompt-mandated).

Baseline: brute-force cosine top-k — one narrow projection computing the
score plus a TakeOrdered (per-partition partial top-k, single merge): at
100 TB this is a full scan but NO shuffle of the vectors themselves.

Scale path: LSH bucketing by hyperplane signs — probe only the query's
bucket (and optionally neighboring buckets), turning the scan into a
partition-pruned lookup when bucketed/partitioned by `bucket` at write
time. An IVF variant would k-means the corpus; hyperplane LSH is chosen
because it is deterministic and expressible without an ML fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import (
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    l2_norm,
    positional_dot,
)

#: deterministic pseudo-hyperplane weight for plane p at position i:
#: ((i·A[p] + B[p]) mod 11) − 5, small ints in [-5, 5] — a public trick
#: standing in for seeded gaussian planes so results are engine-portable.
#: A[p] are primes with no multiple of 11 (a multiplier ≡ 0 mod 11 makes
#: the plane CONSTANT — the old mod-7 scheme had exactly that bug: planes
#: 0 and 7 were both the constant −2, so bucket bits 0 and 7 were always
#: equal and only half the buckets were reachable). (A,B) pairs are
#: distinct mod 11 for p ≤ 14, which lsh_bucket asserts.
_PLANE_A = [3, 5, 7, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59]


def _plane_weight(p: int):
    def w(i: Column) -> Column:
        return ((i * F.lit(_PLANE_A[p]) + F.lit(5 * p + 2)) % F.lit(11) - F.lit(5)).cast("double")

    return w


def lsh_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Bucket id = Σ_p 2^p · [vec·plane_p > 0] — sign-of-projection LSH."""
    if num_planes > 15:
        raise ValueError("lsh_bucket supports at most 15 distinct planes")
    # runtime guard for the property the constants promise: no constant
    # plane (A ≡ 0 mod 11) and no duplicated (A, B) pair mod 11 — a future
    # constants edit must not silently reintroduce unreachable buckets
    pairs = [(_PLANE_A[p] % 11, (5 * p + 2) % 11) for p in range(num_planes)]
    if len(set(pairs)) != num_planes or any(a == 0 for a, _ in pairs):
        # not an assert: python -O would strip it and silently allow a
        # constants edit to reintroduce constant/duplicate planes
        raise ValueError("LSH plane constants collide/degenerate mod 11")
    bucket = F.lit(0)
    for p in range(num_planes):
        proj = positional_dot(vec, _plane_weight(p))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             num_planes: int = 8, bucket_col: str | None = None) -> DataFrame:
    """ANN top-k: restrict the exact search to the query's LSH bucket.

    Pass ``bucket_col`` naming a PRE-COMPUTED bucket column (written
    partitioned/bucketed by it) and the filter lands on the stored column
    — a literal predicate Catalyst pushes into partition pruning, so the
    100 TB query touches one bucket's files. Without it the bucket is
    recomputed per row and the query is a full scan (correct, but no
    pruning can engage on a derived expression).

    CONTRACT: with ``bucket_col``, ``num_planes`` MUST equal the plane
    count used at write time (write_bucketed_embeddings) — the query
    bucket is computed from ``num_planes`` here, and a mismatch silently
    probes a bucket id from a different keyspace (usually an empty
    result, never an error).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if bucket_col is None:
        bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), num_planes))
    else:
        bucketed = df.withColumn("bucket", F.col(bucket_col))
    qrow = df.sparkSession.range(1).select(lsh_bucket(q, num_planes).alias("qb"))
    qb = qrow.collect()[0]["qb"]  # tiny driver-side scalar, like the reference's threshold
    return (
        bucketed.filter(F.col("bucket") == F.lit(qb))
        .select(F.col(id_col), F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to hyperplane LSH.
# Lloyd iterations expressed relationally: assignment is a narrow projection
# against BROADCAST centroid literals (no join), the centroid update is one
# posexplode + groupBy(list, pos) shuffle per iteration. Centroids are tiny
# (k × dim doubles) and live driver-side like the reference's estimated
# thresholds (J4 scalar pattern).
# ---------------------------------------------------------------------------


def _nearest_centroid_col(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin over squared distance ≡ argmax over (dot - |c|²/2) — the k
    scores go into ONE array literal-dotted against the vector, and the
    argmax is array_position(arr, array_max(arr)) (first occurrence, so
    ties break to the smaller centroid id).

    NOT an iterated when(best_score < s_i).otherwise(best_score) chain:
    that embeds the previous best_score expression TWICE per step, so
    the plan tree is O(2^k) — invisible at k=4, but k=16 already hangs
    Catalyst for minutes and k=32 OOMs the driver before a single task
    runs. The array form is O(k) expression nodes and scales to the
    thousands-of-lists codebooks IVF actually uses."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import dot_product

    scores = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        half_norm = sum(x * x for x in c) / 2.0
        scores.append(dot_product(vec, lit) - F.lit(half_norm))
    arr = F.array(*scores)
    return (F.array_position(arr, F.array_max(arr)) - F.lit(1)).cast("int")


def kmeans_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8,
               iters: int = 5, key_col: str = "vec_id") -> list[list[float]]:
    """Deterministic Lloyd's: seeds = hash-ordered first k vectors, then
    `iters` rounds of assign (narrow) + mean (one shuffle). Returns the
    centroid list for broadcast into ivf_assign/ivf_topk.

    FIT ON A SAMPLE. Each Lloyd round re-derives the assignment from
    ``df``'s lineage, so the fit scans its input ``iters`` times (plus
    once for seeds) — inherent to relational Lloyd's, and the standard
    IVF recipe anyway: codebooks are trained on a small sample and the
    full corpus only pays the single ``ivf_assign`` pass. Never point
    this at the full corpus; pass something like
    ``corpus.sample(fraction=...)`` (or ``.limit(n)`` after a hash
    order for determinism) sized so ~``iters``+1 scans of the SAMPLE
    are cheap — 100×k to 10_000×k vectors is plenty for nlists
    centroids (see docs/operations.md). If the caller insists on a
    large input, ``persist()`` it first so the rounds rescan cached
    blocks instead of the source."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import salted_hash

    seeds = (
        df.filter(F.col(vec_col).isNotNull())  # a NULL vector seed would crash the fit
        .select(vec_col).orderBy(salted_hash(F.col(key_col), 7), F.col(key_col))
        .limit(k).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    if not centroids:
        raise ValueError("kmeans_fit: input has no rows")
    k = len(centroids)  # fewer rows than k -> fit with what exists
    from metadata_enhanced_pretrain_datapipeline_spark.partitioning import ensure_min_partitions

    df = ensure_min_partitions(df)
    for _ in range(iters):
        assigned = df.select(
            _nearest_centroid_col(F.col(vec_col), centroids).alias("list_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        means = (
            assigned.groupBy("list_id", "pos").agg(F.avg("v").alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("list_id", F.transform("pm", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        new = {r["list_id"]: [float(x) for x in r["centroid"]] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(k)]
    return centroids


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Attach the inverted-list id. Written partitioned/bucketed by list_id,
    probes scan only nprobe lists — the partition-pruned ANN layout."""
    return df.withColumn("list_id", _nearest_centroid_col(F.col(vec_col), centroids))


def ivf_probe_lists(vec: Column, centroids: list[list[float]],
                    nprobe: int = 2) -> Column:
    """Per-ROW probe set: the ``nprobe`` nearest list ids for each vector
    as an ``array<int>`` — :func:`ivf_topk`'s driver-side probe
    computation lifted into an expression, for operators whose QUERY
    side is a DataFrame (semantic decontamination, batched retrieval)
    rather than one literal vector. Same score (dot − |c|²/2, ≡ nearest
    by distance) and the same tie-break (smaller centroid id) as
    :func:`_nearest_centroid_col`, so ``nprobe=1`` reproduces
    ``ivf_assign`` exactly. O(k log k) expression nodes — the array
    sort, never a when-chain (the r8 O(2^k) lesson)."""
    from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import dot_product

    scored = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        half_norm = sum(x * x for x in c) / 2.0
        scored.append(F.struct(
            (dot_product(vec, lit) - F.lit(half_norm)).alias("s"),
            F.lit(i).alias("i"),
        ))
    ranked = F.array_sort(
        F.array(*scored),
        lambda a, b: F.when(a["s"] > b["s"], F.lit(-1))
        .when(a["s"] < b["s"], F.lit(1))
        .otherwise(a["i"] - b["i"]),
    )
    return F.transform(F.slice(ranked, 1, nprobe), lambda x: x["i"].cast("int"))


def ivf_topk(df: DataFrame, centroids: list[list[float]], query_vec: list[float],
             k: int = 10, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", list_col: str | None = None) -> DataFrame:
    """Probe the nprobe nearest lists, exact cosine inside them only.

    As with lsh_topk, pass ``list_col`` naming a pre-computed (stored)
    list-id column so the isin filter prunes partitions at scan time; the
    derived-expression path is a full scan."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    dists = [float(((np.asarray(c) - q) ** 2).sum()) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:nprobe]
    if list_col is None:
        from metadata_enhanced_pretrain_datapipeline_spark.partitioning import ensure_min_partitions

        assigned = ivf_assign(ensure_min_partitions(df), centroids, vec_col)
    else:
        assigned = df.withColumn("list_id", F.col(list_col))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .select(F.col(id_col), F.round(cosine_similarity(F.col(vec_col), qlit), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def write_bucketed_embeddings(df: DataFrame, path: str, vec_col: str = "embedding",
                              num_planes: int = 8) -> None:
    """Materialize the ANN scale path: compute the LSH bucket once at WRITE
    time and lay the corpus out partitioned by it (one directory per
    bucket). A probe that filters on the stored ``bucket`` column is then
    a literal partition predicate — Catalyst prunes to one directory and
    the 100 TB query reads one bucket's files, which is the design the
    lsh_topk docstring promises (pass bucket_col="bucket" when reading
    back)."""
    (
        df.withColumn("bucket", lsh_bucket(F.col(vec_col), num_planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# int8 quantization — the BYTES lever next to the two pruning levers (LSH
# partition dirs, IVF lists). A float32 embedding column dominates scan and
# shuffle bytes of every ANN stage; symmetric per-vector int8 cuts the
# vector payload 4x (tinyint elements + one float scale), which at 100 TB
# is the difference between a 25 TB and a 100 TB ANN scan. Quantization is
# pure exact-rounded arithmetic (abs/max/div/floor), so scores are
# bit-identical across engines and the whole path stays oracle-checkable —
# unlike learned codebooks (PQ/OPQ), which would land in the same
# rows-only bucket as the k-means fit.
# ---------------------------------------------------------------------------


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        out_col: str = "qvec",
                        scale_col: str = "qscale") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = floor(x_i / scale + 0.5)`` (half-toward-+inf), emitted as
    ``array<tinyint>`` plus the float scale — the storable 4x-smaller
    layout. An all-zero (or empty) vector gets scale 0 and an all-zero
    code. Dequantization is ``q_i * scale``; cosine between quantized
    vectors needs NO scale at all (per-vector scales cancel), which is
    what :func:`quantized_topk` exploits.

    Every step (abs, max, one divide, one floor) is a correctly-rounded
    IEEE op on doubles, so any engine replaying the formula produces the
    same codes — the property the q_quantized_topk oracle checks.

    The scale is BOUND as a lambda variable before the per-element
    divide (r12, the word_shingles lambda-bind pattern): higher-order
    functions are interpreted, not codegen'd, and an inline ``sc``
    subtree re-evaluates the whole abs+array_max pass PER ELEMENT —
    O(d²) per row (measured 18s → 0.6s writing the sf0.1 quantized
    store). The struct result is computed once in its own projection
    and both output columns derive from its fields.
    """
    x = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(x, lambda a: F.abs(a)))
    res = F.get(
        F.transform(
            F.array(amax / F.lit(127.0)),
            lambda sc: F.struct(
                sc.cast("float").alias("sc"),
                F.when(
                    sc > 0,
                    F.transform(
                        x, lambda a: F.floor(a / sc + F.lit(0.5)).cast("tinyint")),
                ).otherwise(
                    F.transform(x, lambda a: F.lit(0).cast("tinyint"))
                ).alias("qx"),
            ),
        ),
        0,
    )
    bound = df.withColumn("__q12", res)
    return (bound
            .withColumn(scale_col, F.col("__q12").getField("sc"))
            .withColumn(out_col, F.col("__q12").getField("qx"))
            .drop("__q12"))


#: column-metadata key stamping the codebook digest on a stored `qvec`
#: column — the ANN analogue of the band store's keying-mode stamp: a
#: store probed (or compacted) with a DIFFERENT codebook has its rows
#: assigned in another keyspace and silently probes the wrong lists.
CODEBOOK_METADATA_KEY = "mep_spark.ivf_codebook"


def codebook_digest(centroids: list[list[float]]) -> str:
    """Deterministic digest of a codebook (md5 over the repr of float
    values — exact, not rounded: two codebooks that differ in any bit
    assign differently)."""
    import hashlib

    payload = ";".join(",".join(repr(float(x)) for x in c)
                       for c in centroids)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def ivf_quantized_codes(df: DataFrame, centroids: list[list[float]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """The store-row projection shared by the batch writer
    (:func:`write_ivf_quantized_store`) and the streaming sink
    (:func:`stream_append_ivf_quantized_store`): quantize, assign
    against the broadcast codebook, stamp the codebook digest on the
    ``qvec`` column — one edit point, so batch-built and
    stream-appended rows can never diverge in codes, assignment, or
    stamp. Pure codegen projection: stateless, so the streaming path
    needs no state store."""
    assigned = ivf_assign(quantize_embeddings(df, vec_col), centroids, vec_col)
    return assigned.select(
        id_col,
        F.col("qvec").alias(
            "qvec",
            metadata={CODEBOOK_METADATA_KEY: codebook_digest(centroids)}),
        "qscale", "list_id")


def write_ivf_quantized_store(df: DataFrame, path: str,
                              centroids: list[list[float]],
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> None:
    """The PRODUCTION ANN layout, composing both scale levers in one
    store: rows are assigned to their IVF list (argmax against the
    broadcast codebook, computed on the FLOAT vectors so recall matches
    the float index) and written partitioned by ``list_id``, and the
    files hold symmetric-int8 codes (``array<tinyint>`` + float scale)
    instead of the float vectors. A probe then reads
    ``nprobe / nlists`` of the directories AND a quarter of the bytes
    per directory — at 100 TB of float32 embeddings that is a
    ``(nprobe/nlists) × ~0.27`` scan fraction, the configuration a real
    index ships (FAISS IVF-SQ8 shape, here as a parquet layout).

    The float vectors are deliberately NOT stored: the store is
    probe-only. Keep the source table for exact re-ranking flows.

    The codebook's digest is stamped as ``qvec`` column metadata
    (:data:`CODEBOOK_METADATA_KEY` — a data column: partition-column
    metadata does not survive the directory encoding), so probes and
    compaction can verify they carry the SAME codebook the rows were
    assigned under.

    The input is widened to full parallelism first (r12,
    ensure_min_partitions): quantize+assign is interpreted
    higher-order-function CPU per row, and the sf0.1 single-file scan
    ran the whole projection in ONE task; production-wide scans are
    untouched (the helper no-ops on already-wide inputs). The codes
    then cluster by ``list_id`` before the dynamic-partition write —
    the projection stays wide (map side of the exchange), and each
    list directory gets AQE-sized files instead of one file per
    (task, list) pair. With production-sized codebooks (hundreds to
    thousands of lists) the exchange spreads well; a deployment with
    very few lists and very hot ones should drop to
    ``repartition(N, "list_id", <salt>)``.
    """
    from metadata_enhanced_pretrain_datapipeline_spark.partitioning import (
        ensure_min_partitions,
    )

    (
        ivf_quantized_codes(ensure_min_partitions(df), centroids, id_col,
                            vec_col)
        # explicit width: without it AQE coalesces the small exchange
        # to one task that opens every list's file serially
        .repartition(df.sparkSession.sparkContext.defaultParallelism,
                     "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )


def ivf_quantized_topk(store: DataFrame, centroids: list[list[float]],
                       query_vec: list[float], k: int = 10, nprobe: int = 2,
                       id_col: str = "vec_id") -> DataFrame:
    """Probe a :func:`write_ivf_quantized_store` layout: pick the nprobe
    nearest lists driver-side (centroids are tiny — the J4 scalar
    pattern), filter with a LITERAL isin that Catalyst turns into
    PartitionFilters on the directory layout, and score the tinyint
    codes with :func:`quantized_topk`'s exact-integer prequantized path
    (per-vector scales cancel out of cosine, so the stored ``qscale`` is
    not even read — column pruning drops it from the scan).

    If the store carries a codebook stamp (every
    :func:`write_ivf_quantized_store` output does), a probe with a
    DIFFERENT codebook raises: nprobe lists picked in another keyspace
    silently return far-from-nearest results, never an error."""
    import numpy as np

    stamped = (store.schema["qvec"].metadata or {}).get(
        CODEBOOK_METADATA_KEY) if "qvec" in store.columns else None
    if stamped is not None and stamped != codebook_digest(centroids):
        raise ValueError(
            "ivf_quantized_topk: store was written under codebook "
            f"{stamped}, probed with {codebook_digest(centroids)} — "
            "list ids are in different keyspaces; probe with the "
            "writing codebook or rebuild the store.")
    q = np.asarray(query_vec, dtype=float)
    dists = [float(((np.asarray(c) - q) ** 2).sum()) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:nprobe]
    probed = store.filter(F.col("list_id").isin(probe))
    return quantized_topk(probed, query_vec, k=k, id_col=id_col,
                          vec_col="qvec", prequantized=True)


def compact_ivf_quantized_store(spark, monthly_paths: list[str],
                                out_path: str,
                                id_col: str = "vec_id") -> None:
    """IVF-quantized store LIFECYCLE (the ANN analogue of
    compact_band_store): merge N monthly stores into one probe layout.
    Resolution is LATEST-WINS — ``monthly_paths`` in chronological
    order; a vector re-embedded in a later month (re-crawled doc, model
    refresh of one shard) replaces its older codes — which is the
    correct semantics for embeddings, where re-ingestion can CHANGE the
    vector (the band store's ``distinct`` is right for band keys, which
    are identical across months by construction).

    Scale: one max_by aggregation over id (rows are (id, codes, scale,
    list) — narrow; partial aggregation collapses each id map-side, so
    the exchange moves ~one row per id) and one ``repartition(list_id)``
    so each list directory writes one file per shuffle partition. Input directories are left in place
    (write-then-swap discipline; ``out_path`` must not be an input).

    Codebook safety: stores stamped under DIFFERENT codebooks raise —
    their list ids are in different keyspaces and the merged store
    would probe garbage. The surviving stamp is re-applied to the
    output (union keeps the first input's metadata; an unstamped first
    month would silently drop it).
    """
    from functools import reduce

    from pyspark.sql import Window

    # normalized comparison: a trailing slash, relative-vs-absolute
    # spelling, or symlink alias of an input must not slip past the
    # guard — mode("overwrite") on an input store mid-read destroys it
    import os as _os

    if _os.path.realpath(out_path) in {_os.path.realpath(p)
                                       for p in monthly_paths}:
        raise ValueError(
            "compact_ivf_quantized_store: out_path is one of "
            "monthly_paths — overwriting an input store mid-read would "
            "destroy it; write to a fresh path, then swap.")
    stores = [spark.read.parquet(p) for p in monthly_paths]
    stamps = {(s.schema["qvec"].metadata or {}).get(CODEBOOK_METADATA_KEY)
              for s in stores} - {None}
    if len(stamps) > 1:
        raise ValueError(
            f"compact_ivf_quantized_store: stores mix codebooks "
            f"{sorted(stamps)} — their list ids never agree; rebuild "
            "the odd months under one codebook first.")
    tagged = [
        s.select(id_col, "qvec", "qscale", "list_id",
                 F.lit(i).alias("__month"))
        for i, s in enumerate(stores)
    ]
    merged = reduce(lambda a, b: a.unionByName(b), tagged)
    # max_by aggregation instead of a row_number window (r12): same
    # latest-wins row per id (months are distinct literals, so the max
    # is unique), but the aggregate gets map-side partial aggregation —
    # the exchange moves at most one row per (id, map partition)
    # instead of every monthly row — and skips the window's full sort.
    latest = (
        merged.groupBy(id_col)
        .agg(F.max_by(F.struct("qvec", "qscale", "list_id"),
                      F.col("__month")).alias("__s"))
        .select(id_col, "__s.qvec", "__s.qscale", "__s.list_id")
        .repartition("list_id")
    )
    if stamps:
        latest = latest.select(
            id_col,
            F.col("qvec").alias(
                "qvec", metadata={CODEBOOK_METADATA_KEY: stamps.pop()}),
            "qscale", "list_id")
    latest.write.mode("overwrite").partitionBy("list_id").parquet(out_path)


def ivf_quantized_rerank_topk(store: DataFrame, corpus: DataFrame,
                              centroids: list[list[float]],
                              query_vec: list[float], k: int = 10,
                              nprobe: int = 2, overfetch: int = 4,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Two-stage retrieval, the production ANN composition: stage 1
    probes the :func:`write_ivf_quantized_store` layout for
    ``k × overfetch`` candidates on int8 scores (reads nprobe/nlists
    directories of tinyint bytes); stage 2 joins the candidate IDS —
    never the vectors — back to the float corpus and re-ranks the
    survivors by exact cosine. The int8 rank error (≤ ~2e-3 on cosine,
    measured in tests) only matters at the candidate CUTOFF, so
    overfetching a small factor recovers exact-top-k recall while the
    expensive float scan touches ``k × overfetch`` rows instead of the
    corpus.

    Scale: the candidate set is ≤ k × overfetch rows → broadcast
    semi-join against the corpus (AQE turns it into a broadcast join at
    runtime; the explicit hint keeps it one even without AQE). At
    100 TB: stage 1 reads (nprobe/nlists) × ~0.29 of the bytes, stage 2
    reads k × overfetch rows by id — if the corpus is id-bucketed, no
    shuffle at all.
    """
    cand = ivf_quantized_topk(store, centroids, query_vec,
                              k=k * overfetch, nprobe=nprobe,
                              id_col=id_col).select(id_col)
    return brute_force_topk(
        corpus.join(F.broadcast(cand), id_col, "left_semi"),
        query_vec, k=k, id_col=id_col, vec_col=vec_col)


def quantized_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   prequantized: bool = False) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: the corpus
    and the query are quantized with :func:`quantize_embeddings`'s
    formula, scores are integer dot products rescaled by the integer
    norms (scales cancel out of cosine), and the top-k is the same
    TakeOrderedAndProject as :func:`brute_force_topk`.

    All dot products are sums of products of ints ≤ 127², exactly
    representable in doubles regardless of accumulation order — so
    unlike float cosine, the scores carry ZERO accumulation noise and
    rank order is engine-exact without any rounding grid. Zero-norm
    corpus vectors are excluded (their cosine is undefined).

    At 100 TB this scan reads a quarter of the float32 bytes; compose
    with the LSH/IVF layouts (quantize, then partition by bucket/list)
    to cut bytes AND files in the same probe.

    ``prequantized=True`` treats ``vec_col`` as ALREADY-stored int8
    codes (the output of :func:`quantize_embeddings` written at layout
    time) and skips the in-flight quantization — the production shape:
    quantize once at write, probe the tinyint column. The default
    re-quantizes per query, which pays ~4 extra array passes per row
    (abs/max/divide/floor) and exists for ad-hoc use over a float
    corpus; at scale, store the codes.
    """
    import math

    xs = [float(v) for v in query_vec]
    amax = max((abs(v) for v in xs), default=0.0)
    qsc = amax / 127.0
    qq = [float(math.floor(v / qsc + 0.5)) if qsc > 0 else 0.0 for v in xs]
    qn = math.sqrt(sum(v * v for v in qq))  # exact int sum, rounded sqrt
    if qn == 0.0:
        raise ValueError("quantized_topk: query vector has zero norm")
    qlit = F.array(*[F.lit(v) for v in qq])
    if prequantized:
        quantized = df.withColumn("qvec", F.col(vec_col))
    else:
        quantized = quantize_embeddings(df, vec_col)
    qx = F.col("qvec").cast("array<double>")
    scored = (
        quantized
        .select(
            F.col(id_col),
            dot_product(qx, qlit).alias("__dp"),
            dot_product(qx, qx).alias("__aa"),
        )
        .filter(F.col("__aa") > 0)
        .select(
            id_col,
            (F.col("__dp") / (F.sqrt(F.col("__aa")) * F.lit(qn))).alias("qcos"),
        )
    )
    return scored.orderBy(F.desc("qcos"), F.col(id_col)).limit(k)


def _nearest_code_col(subvec: Column, sub_codebook: list[list[float]]) -> Column:
    """Per-subspace PQ code: argmin ||x-c||² ≡ argmax (dot - |c|²/2),
    same identity as :func:`_nearest_centroid_col` but O(1) expression
    nodes per subspace — the centroids and their (Python-exact) half
    norms travel as two LITERAL arrays zip_with'd at runtime, so m
    subspaces cost O(m) plan nodes, not O(m·ksub) dot chains (the r8
    argmax plan-explosion lesson, one level up: a 96×256 production
    codebook must not build 24k expression subtrees)."""
    cb = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                   for c in sub_codebook])
    hn = F.array(*[F.lit(sum(float(x) * float(x) for x in c) / 2.0)
                   for c in sub_codebook])
    scores = F.zip_with(cb, hn, lambda c, h: dot_product(c, subvec) - h)
    return (F.array_position(scores, F.array_max(scores)) - F.lit(1)).cast(
        "tinyint")


def _pq_shape(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    """Validate a PQ codebook list and return (m, ksub, dsub)."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("pq: empty codebook list")
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if ksub > 127:
        raise ValueError(
            f"pq: ksub={ksub} does not fit a tinyint code (max 127); "
            "shrink the per-subspace codebook or widen the code column")
    for j, sub in enumerate(codebooks):
        if len(sub) != ksub or any(len(c) != dsub for c in sub):
            raise ValueError(f"pq: ragged codebook at subspace {j} "
                             f"(expected {ksub} centroids of dim {dsub})")
    return m, ksub, dsub


def pq_fit(df: DataFrame, m: int = 8, ksub: int = 16,
           vec_col: str = "embedding", iters: int = 5,
           key_col: str = "vec_id") -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector splits into
    ``m`` contiguous subspaces and each gets its own independent
    :func:`kmeans_fit` over the SLICED sample (Jégou et al. 2011, PQ).

    FIT ON A SAMPLE — this runs m separate Lloyd fits, each rescanning
    its input iters+1 times (the kmeans_fit contract, m-fold); pass a
    sampled/limited frame and ``persist()`` it first so the m·(iters+1)
    passes hit cached blocks. The full corpus pays only the single
    :func:`pq_encode` pass."""
    first = df.select(vec_col).limit(1).collect()
    if not first:
        raise ValueError("pq_fit: input has no rows")
    dim = len(first[0][0])
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        kmeans_fit(
            df.select(F.col(key_col),
                      F.slice(F.col(vec_col), j * dsub + 1, dsub)
                      .alias(vec_col)),
            vec_col, k=ksub, iters=iters, key_col=key_col)
        for j in range(m)
    ]


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              out_col: str = "pq_codes") -> DataFrame:
    """Product-quantize a float corpus to ``m`` tinyint codes per row —
    the bytes lever past scalar int8 (:func:`quantize_embeddings` is
    dim bytes/vector; PQ is m bytes: a 64-dim float32 corpus shrinks
    256 → 8 bytes at m=8, 32×). Each subspace's code is the nearest
    sub-centroid by L2 (argmax of dot - |c|²/2, ties to the smaller
    code — engine-exact, replayable in SQL). One projection pass, all
    JVM expressions; compose with ivf_assign + partitionBy for the
    FAISS IVFPQ layout."""
    m, _, dsub = _pq_shape(codebooks)
    codes = [
        _nearest_code_col(F.slice(F.col(vec_col), j * dsub + 1, dsub),
                          codebooks[j])
        for j in range(m)
    ]
    return df.withColumn(out_col, F.array(*codes))


def pq_adc_topk(codes_df: DataFrame, codebooks: list[list[list[float]]],
                query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                codes_col: str = "pq_codes") -> DataFrame:
    """Asymmetric distance computation over PQ codes: the query builds
    an m×ksub inner-product lookup table DRIVER-side (m·ksub·dsub
    flops, once), and each corpus row's score is m array lookups + m
    adds — score = dot(query, PQ-reconstruction(x)), never a per-row
    float dot over the original dim. Returns (id, adc_score) top-k via
    TakeOrderedAndProject. The scan reads m bytes/vector: at 100 TB of
    float32 embeddings, the ADC pass reads ~3 TB at m=8·dim=64 — and
    the ids-only result feeds the same broadcast re-rank as
    :func:`ivf_quantized_rerank_topk` when float-exact order matters."""
    m, ksub, dsub = _pq_shape(codebooks)
    if len(query_vec) != m * dsub:
        raise ValueError(f"pq_adc_topk: query dim {len(query_vec)} != "
                         f"m*dsub = {m * dsub}")
    lut = [
        [sum(float(q) * float(c)
             for q, c in zip(query_vec[j * dsub:(j + 1) * dsub], cent))
         for cent in sub]
        for j, sub in enumerate(codebooks)
    ]
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    score = F.aggregate(
        F.zip_with(F.col(codes_col), lut_lit,
                   lambda c, t: F.element_at(t, c.cast("int") + F.lit(1))),
        F.lit(0.0), lambda acc, x: acc + x)
    return (codes_df.select(F.col(id_col),
                            F.round(score, 6).alias("adc_score"))
            .orderBy(F.desc("adc_score"), F.col(id_col)).limit(k))


#: pq_codes column metadata key: digest of (coarse codebook, PQ codebooks)
PQ_CODEBOOK_METADATA_KEY = "mep_spark.ivfpq_codebook"


def ivfpq_digest(coarse: list[list[float]],
                 codebooks: list[list[list[float]]]) -> str:
    """Digest binding BOTH codebooks an IVFPQ store was written under —
    residual codes are meaningless against a different coarse codebook
    even when the PQ books match, so the stamp covers the pair."""
    import hashlib

    payload = codebook_digest(coarse) + "|" + ";".join(
        codebook_digest(sub) for sub in codebooks)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def ivfpq_codes(df: DataFrame, coarse: list[list[float]],
                codebooks: list[list[list[float]]],
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """The IVFPQ store-row projection: coarse-assign on the FLOAT
    vectors (recall matches the float index), then product-quantize the
    RESIDUAL x - coarse_centroid (FAISS's by_residual encoding:
    residuals are centered near zero, so the same sub-codebook budget
    spends its resolution where the list's vectors actually live).
    Rows are (id, pq_codes array<tinyint> stamped with the joint
    codebook digest, list_id) — m + 1 bytes of payload per vector.
    Pure codegen projection, stateless (streaming-sink safe)."""
    assigned = ivf_assign(df, coarse, vec_col)
    coarse_lit = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                           for c in coarse])
    resid = F.zip_with(
        F.col(vec_col),
        F.element_at(coarse_lit, F.col("list_id").cast("int") + F.lit(1)),
        lambda a, b: a.cast("double") - b)
    enc = pq_encode(assigned.withColumn("__resid", resid), codebooks,
                    vec_col="__resid")
    return enc.select(
        id_col,
        F.col("pq_codes").alias(
            "pq_codes",
            metadata={PQ_CODEBOOK_METADATA_KEY: ivfpq_digest(coarse,
                                                             codebooks)}),
        "list_id")


def write_ivfpq_store(df: DataFrame, path: str, coarse: list[list[float]],
                      codebooks: list[list[list[float]]],
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """The FAISS-IVFPQ parquet layout: nlists directories
    (``partitionBy(list_id)`` — probes arrive as PartitionFilters) of
    m-byte PQ codes over residuals. Both scale levers at their
    strongest settings: a probe reads nprobe/nlists directories AND
    m bytes per vector — 64-dim float32 at m=8 is 32× fewer payload
    bytes than the float corpus and 8× fewer than the int8 store. The
    float vectors are deliberately NOT stored (probe-only layout;
    keep the source table for exact re-rank)."""
    (
        ivfpq_codes(df, coarse, codebooks, id_col, vec_col)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )


def ivfpq_topk(store: DataFrame, coarse: list[list[float]],
               codebooks: list[list[list[float]]],
               query_vec: list[float], k: int = 10, nprobe: int = 2,
               id_col: str = "vec_id") -> DataFrame:
    """Probe a :func:`write_ivfpq_store` layout with per-list ADC: pick
    the nprobe nearest coarse lists driver-side, and for each build the
    residual-query lookup table lut_l[j][c] = dot((q - coarse_l)_j,
    sub_centroid_c) plus the scalar coarse term dot(q, coarse_l) — so a
    row in list l scores dot(q, coarse_l + PQ-recon(residual)) with m
    map-backed lookups and adds, never a per-row float dot. The
    nprobe-entry literal maps are O(nprobe) lookups per row (tiny —
    the r7 literal-map lesson bites at hundreds of entries, not
    single digits). A store stamped under different codebooks raises,
    same contract as :func:`ivf_quantized_topk`."""
    import numpy as np

    m, ksub, dsub = _pq_shape(codebooks)
    stamped = (store.schema["pq_codes"].metadata or {}).get(
        PQ_CODEBOOK_METADATA_KEY) if "pq_codes" in store.columns else None
    if stamped is not None and stamped != ivfpq_digest(coarse, codebooks):
        raise ValueError(
            "ivfpq_topk: store was written under codebook pair "
            f"{stamped}, probed with {ivfpq_digest(coarse, codebooks)} — "
            "residual codes are in a different keyspace; probe with the "
            "writing codebooks or rebuild the store.")
    q = np.asarray(query_vec, dtype=float)
    dists = [float(((np.asarray(c) - q) ** 2).sum()) for c in coarse]
    probe = sorted(range(len(coarse)), key=lambda i: dists[i])[:nprobe]
    lut_entries: list[Column] = []
    coarse_entries: list[Column] = []
    for l in probe:
        rq = [float(a) - float(b) for a, b in zip(query_vec, coarse[l])]
        lut = [
            [sum(a * float(b) for a, b in zip(rq[j * dsub:(j + 1) * dsub],
                                              cent))
             for cent in sub]
            for j, sub in enumerate(codebooks)
        ]
        lut_entries += [F.lit(l), F.array(*[
            F.array(*[F.lit(v) for v in row]) for row in lut])]
        coarse_entries += [F.lit(l), F.lit(float(
            sum(float(a) * float(b) for a, b in zip(query_vec, coarse[l]))))]
    lut_map = F.create_map(*lut_entries)
    coarse_map = F.create_map(*coarse_entries)
    score = F.element_at(coarse_map, F.col("list_id")) + F.aggregate(
        F.zip_with(F.col("pq_codes"),
                   F.element_at(lut_map, F.col("list_id")),
                   lambda c, t: F.element_at(t, c.cast("int") + F.lit(1))),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        store.filter(F.col("list_id").isin(probe))
        .select(F.col(id_col), F.round(score, 6).alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(ranked: list[DataFrame], k: int = 10, c: float = 60.0,
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    retrieval lists: ``rrf = Σ_legs 1 / (c + rank)`` summed over the
    legs that returned the id, descending — the standard way to fuse a
    lexical (BM25) and a semantic (ANN) leg into one hybrid retrieval
    result without score calibration (ranks, not raw scores, are what
    cross the legs, so BM25's unbounded scores and cosine's [-1, 1]
    never need to be commensurable).

    Each input frame must carry ``id_col`` and an integer ``rank``
    column (1-based) — the shape :func:`bm25_topk` emits; an ANN leg
    adds rank with a ≤k-row window. c=60 is the paper's constant.

    Scale: the LEGS are the expensive part (each already top-k's its
    corpus with TakeOrderedAndProject / partition-pruned probes); this
    fusion sees at most Σ k_leg rows — driver-trivial at any corpus
    size, so a plain union + groupBy is the right plan (no broadcast
    gymnastics needed for an input bounded by the legs' k).

    Ordering is pinned by the 9dp-rounded fused score with id
    tie-break (the bm25_topk rule: two ids hit by the same leg-set at
    equal ranks fuse to bit-identical sums, but cross-engine float
    display drift is absorbed by ranking on the rounded value while
    emitting the unrounded one).
    """
    if not ranked:
        raise ValueError("rrf_fuse: at least one ranked leg required")
    contribs = [
        df.select(F.col(id_col).alias("id"),
                  (1.0 / (F.lit(float(c)) + F.col("rank").cast("double"))
                   ).alias("contrib"))
        for df in ranked
    ]
    merged = contribs[0]
    for nxt in contribs[1:]:
        merged = merged.unionByName(nxt)
    fused = merged.groupBy("id").agg(F.sum("contrib").alias("rrf_score"))
    return (
        fused.orderBy(F.round(F.col("rrf_score"), 9).desc(), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "rrf_score")
    )


def cluster_balanced_sample(df: DataFrame, centroids: list[list[float]],
                            cap: int, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Cluster-balanced sampling: assign every vector to its nearest
    centroid (:func:`ivf_assign` — the SemDeDup/DoReMi-style k-means
    clustering of the corpus) and keep at most ``cap`` rows per cluster
    by deterministic hash priority — a uniform within-cluster sample.
    This is the diversity-preserving downsample of a pretraining mix:
    a crawl where one semantic cluster (boilerplate, listings) is 100×
    over-represented contributes at most ``cap`` examples, same as the
    rarest cluster.

    Scale: inherits :func:`per_host_cap`'s bucketed two-phase cap — the
    per-cluster selection never sorts a whole mega-cluster in a single
    task (exactly where a naive per-cluster row_number window dies at
    100 TB), and the assignment is the O(k)-expression argmax with no
    shuffle of the vectors.
    """
    from metadata_enhanced_pretrain_datapipeline_spark.operators.sampling import per_host_cap

    assigned = ivf_assign(df, centroids, vec_col)
    return per_host_cap(assigned, "list_id", cap, F.col(id_col))


def _rank_bands(scored: DataFrame, pos_k: int, neg_start: int,
                neg_end: int) -> DataFrame:
    """Shared two-phase partial top-k + rank-band selection of the two
    hard-negative miners over a (query_id, cand_id, cosine) relation:
    per input partition each query keeps its ``neg_end`` best, then the
    per-partition winners merge per query (<= neg_end x partitions rows
    each; insert another merge level at extreme partition counts) —
    never a full per-query sort in one task. Ranks on (rounded cosine
    desc, id) via the ascending struct sort of (-cosine, id).

    Memory note: phase 1's ``collect_list`` gathers a query's ENTIRE
    per-partition candidate list before ``array_sort``/``slice``
    truncates it — per-group memory is bounded by the partition's
    candidate count for that query, NOT by ``neg_end``. That bound is
    what the callers engineer: the flat miner caps |Q| and fans the
    corpus out once (each (query, partition) group ≈ partition_rows),
    the bucketed miner equi-joins on list_id (group ≈ list size /
    partitions). A neg_end-bounded accumulator would need a Python
    UDAF — the slow path — for a truncation the slice already does at
    partition granularity."""
    k = int(neg_end)
    ent = F.struct((-F.col("cosine")).alias("nc"),
                   F.col("cand_id").alias("i"),
                   F.col("cosine").alias("c"))
    partial = (
        scored.groupBy("query_id", F.spark_partition_id().alias("__p"))
        .agg(F.slice(F.array_sort(F.collect_list(ent)), 1, k).alias("__top"))
    )
    merged = (
        partial.select("query_id", F.explode("__top").alias("e"))
        .groupBy("query_id")
        .agg(F.slice(F.array_sort(F.collect_list("e")), 1, k).alias("__top"))
    )
    ranked = merged.select(
        "query_id", F.posexplode("__top").alias("__pos", "e")
    ).select(
        "query_id",
        F.col("e.i").alias("cand_id"),
        F.col("e.c").alias("cosine"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )
    return ranked.filter(
        (F.col("rank") <= pos_k)
        | ((F.col("rank") >= neg_start) & (F.col("rank") <= neg_end))
    ).withColumn(
        "role", F.when(F.col("rank") <= pos_k, "pos").otherwise("neg")
    )


def mine_hard_negatives(df: DataFrame, query_ids: list[int],
                        pos_k: int = 1, neg_start: int = 4,
                        neg_end: int = 6, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_queries: int = 4096) -> DataFrame:
    """Hard-negative mining for embedding/retrieval training data: for
    each query document, the top-``pos_k`` nearest neighbors (excluding
    itself) become positives and ranks ``neg_start..neg_end`` become
    hard negatives — near the query but not nearest, the pairs a
    contrastive loss learns most from (the in-batch-random-negative
    alternative is too easy; rank-banded mining is the standard
    curriculum). Returns (query_id, cand_id, cosine, rank, role).

    Scale shape: the ≤``max_queries`` query vectors broadcast and
    fan the corpus out ONCE (one scan, no corpus shuffle); per-query
    ranking is a two-phase partial top-k — per input partition each
    query keeps only its ``neg_end`` best candidates (bounded
    collect_list inside one partition-group), then the per-partition
    winners merge per query (≤ neg_end × partitions rows per query;
    at extreme partition counts insert another merge level) — never a
    full per-query corpus sort in one task (the q_window_suite
    parallelism-cap lesson). Ranking is on the 6dp-rounded cosine with
    id tie-break, so rank bands are deterministic and engine-portable.
    """
    if len(query_ids) > max_queries:
        raise ValueError(
            f"mine_hard_negatives: {len(query_ids)} query ids exceed "
            f"max_queries={max_queries} — the query side must stay "
            "broadcast-small; batch the mining over query chunks.")
    qset = [int(q) for q in query_ids]
    qvecs = (
        df.filter(F.col(id_col).isin(qset))
        .select(F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv"),
                l2_norm(F.col(vec_col)).alias("__qn"))
    )
    # candidate norms once per corpus row, query norms once per broadcast
    # row (r12): bit-identical to the per-pair cosine, |corpus|·|Q| fewer
    # interpreted norm folds
    scored = (
        df.withColumn("__vn", l2_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(qvecs))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col).alias("cand_id"),
            F.round(cosine_from_norms(F.col(vec_col), F.col("__qv"),
                                      F.col("__vn"), F.col("__qn")), 6)
            .alias("cosine"),
        )
    )
    return _rank_bands(scored, pos_k, neg_start, neg_end)


def mine_hard_negatives_bucketed(df: DataFrame, query_ids: list[int],
                                 centroids: list[list[float]],
                                 pos_k: int = 1, neg_start: int = 4,
                                 neg_end: int = 6, id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 max_queries: int = 4096) -> DataFrame:
    """:func:`mine_hard_negatives` at corpus scale: instead of scoring
    every query against the WHOLE corpus (|corpus| × |Q| work — the
    exact shape the flat miner's scale fixture shows going superlinear
    when |Q| grows with the corpus), both sides are assigned to their
    IVF list and each query ranks only candidates in ITS OWN list —
    an equi-join on ``list_id`` (BroadcastHashJoin while Q is small,
    plain shuffle join when it is not; never a nested-loop fan-out), so
    work drops to ~|corpus| × |Q| / nlists and the nlists codebook is a
    direct scale lever. The within-cluster restriction is also the
    SEMANTICS you want: candidates outside the query's cluster are easy
    negatives by construction, and SemDeDup-style mining ranks inside
    the cluster anyway. Same rank bands, same two-phase partial top-k,
    same output schema as the flat miner.
    """
    if len(query_ids) > max_queries:
        raise ValueError(
            f"mine_hard_negatives_bucketed: {len(query_ids)} query ids "
            f"exceed max_queries={max_queries} — drop the broadcast "
            "hint expectation and batch, or raise the guard knowingly.")
    qset = [int(q) for q in query_ids]
    # norms hoisted below the list_id join (r12, the mine_bitext pattern)
    assigned = ivf_assign(df, centroids, vec_col).withColumn(
        "__vn", l2_norm(F.col(vec_col)))
    qvecs = (
        assigned.filter(F.col(id_col).isin(qset))
        .select(F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qv"),
                F.col("__vn").alias("__qn"), "list_id")
    )
    scored = (
        assigned.join(F.broadcast(qvecs), "list_id")
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col).alias("cand_id"),
            F.round(cosine_from_norms(F.col(vec_col), F.col("__qv"),
                                      F.col("__vn"), F.col("__qn")), 6)
            .alias("cosine"),
        )
    )
    return _rank_bands(scored, pos_k, neg_start, neg_end)


def mine_bitext(x: DataFrame, y: DataFrame, centroids: list[list[float]],
                k: int = 4, margin_threshold: float = 1.05,
                id_col: str = "vec_id", vec_col: str = "embedding",
                mutual: bool = True, round_dp: int = 9,
                nprobe: int = 1) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    "Margin-based parallel corpus mining with multilingual sentence
    embeddings" — the CCMatrix/LASER recipe): pair source-language
    sentences ``x`` with target-language sentences ``y`` whose
    embeddings are mutual nearest neighbors under the RATIO margin

        margin(x, y) = cos(x, y) / ((avgₖ cos(x, ·) + avgₖ cos(y, ·)) / 2)

    — the k-NN-average denominators penalize hubs (sentences close to
    everything) that plain cosine thresholds mis-mine. Bitext mined
    this way is the standard source of parallel pretraining data for
    multilingual models; reference parity: the bidirectional pair
    formatter family (europarl/main_bidirectional.py) consumes exactly
    such pairs.

    Scale shape: both sides take their IVF list assignment against the
    SHARED ``centroids`` (a multilingual codebook) and candidates meet
    in an equi-join on ``list_id`` — work is ~|X|·|Y|/nlists, never the
    |X|·|Y| cross product, and nlists is the direct scale lever (the
    bucketed-miner shape). Rank/average windows partition by the
    high-cardinality sentence ids — many small partitions, no mega-key
    sort. The margin denominators therefore average within-list
    candidates: exact whenever the list holds the true k-NN, the same
    locality premise IVF retrieval itself rests on (measure with
    scripts/ann_recall.py; raise nlists recall concerns there first).

    ``mutual=True`` keeps a pair only when y is x's best candidate AND
    x is y's best — the intersection heuristic the paper reports
    strongest. Cosines are rounded to ``round_dp`` before ranking (the
    BM25 tie-pinning precedent) and the margin to 6dp before the
    threshold, so selection is bit-portable cross-engine. Zero-norm
    embeddings yield NULL cosine/margin and drop out of every band.

    ``nprobe`` is the recall lever (the semantic_decontam_ivf
    pattern): each x probes its ``nprobe`` nearest lists via
    :func:`ivf_probe_lists`, so a true pair sitting just across a
    centroid boundary is still met — work scales ×nprobe, and misses
    are expensive in mining (an unmined pair is training data lost),
    so >1 is the production default the decontaminator also uses.
    """
    if nprobe == 1:
        xa = ivf_assign(x, centroids, vec_col).select(
            F.col(id_col).alias("x_id"), F.col(vec_col).alias("__xv"),
            "list_id")
    else:
        xa = x.select(
            F.col(id_col).alias("x_id"), F.col(vec_col).alias("__xv"),
            F.explode(ivf_probe_lists(F.col(vec_col), centroids, nprobe))
            .alias("list_id"))
    # norms hoisted out of the pair join (r12): each side's l2_norm is
    # computed once per VECTOR below the join instead of once per
    # candidate pair above it — bit-identical (same fold over the same
    # array), and the per-pair interpreted work drops from dot+2 norms
    # to the dot alone.
    xa = xa.withColumn("__xn", l2_norm(F.col("__xv")))
    ya = ivf_assign(y, centroids, vec_col).select(
        F.col(id_col).alias("y_id"), F.col(vec_col).alias("__yv"), "list_id"
    ).withColumn("__yn", l2_norm(F.col("__yv")))
    pairs = xa.join(ya, "list_id").select(
        "x_id", "y_id",
        F.round(cosine_from_norms(F.col("__xv"), F.col("__yv"),
                                  F.col("__xn"), F.col("__yn")), round_dp)
        .alias("cosine"))

    from pyspark.sql import Window as W
    wx = W.partitionBy("x_id").orderBy(F.col("cosine").desc(), "y_id")
    wy = W.partitionBy("y_id").orderBy(F.col("cosine").desc(), "x_id")
    kf = F.lit(int(k))
    # window order (r12): rank-x, avg-x, rank-y, avg-y — each avg window
    # shares its rank window's partitioning (x_id / y_id), so the four
    # window ops plan as TWO exchanges instead of the four the
    # rank-rank-avg-avg order produced (each avg needs only partitioning,
    # no ordering, and sits directly on its same-key rank output).
    ranked = (pairs
              .withColumn("__rx", F.row_number().over(wx))
              .withColumn("__dx",
                          F.avg(F.when(F.col("__rx") <= kf, F.col("cosine")))
                          .over(W.partitionBy("x_id")))
              .withColumn("__ry", F.row_number().over(wy))
              .withColumn("__dy",
                          F.avg(F.when(F.col("__ry") <= kf, F.col("cosine")))
                          .over(W.partitionBy("y_id"))))
    scored = ranked.withColumn(
        "margin",
        F.round(F.try_divide(F.col("cosine"),
                             (F.col("__dx") + F.col("__dy")) / F.lit(2.0)),
                6))
    keep = (F.col("__rx") == 1) & (F.col("margin") >= F.lit(
        float(margin_threshold)))
    if mutual:
        keep = keep & (F.col("__ry") == 1)
    return scored.filter(keep).select("x_id", "y_id", "cosine", "margin")


def rp_project(df: DataFrame, out_dim: int = 8, vec_col: str = "embedding",
               out_col: str = "rp") -> DataFrame:
    """Johnson–Lindenstrauss-style signed random projection: ``out_dim``
    deterministic ±-weight planes (the :func:`lsh_bucket` plane family —
    small-int weights from a public mod-11 trick, engine-portable where
    seeded gaussians are not) map a d-dim embedding to ``out_dim``
    doubles. The DIMENSION lever of the compression triad — int8
    quantization cuts bytes/component (4×), PQ cuts both (32×),
    projection cuts components (d/out_dim×) while JL keeps pairwise
    angles approximately; and unlike PQ the output is still a plain
    vector, so every downstream operator (brute-force/IVF/store
    layouts, near-dup, mining) composes unchanged on the ``out_col``.

    Measure the recall cost on YOUR corpus before adopting:
    ``scripts/ann_recall.py`` runs on any (vec_id, embedding) parquet —
    write the projected corpus and point it there (the nprobe-guidance
    precedent: publish both endpoints, never assume).

    Narrow projection, no shuffle, O(out_dim · d) plan nodes; raises
    past 15 planes (the distinct-constants bound lsh_bucket asserts).
    """
    if out_dim > 15:
        raise ValueError("rp_project supports at most 15 distinct planes")
    projs = [positional_dot(F.col(vec_col), _plane_weight(p))
             for p in range(out_dim)]
    return df.withColumn(out_col, F.array(*projs))
