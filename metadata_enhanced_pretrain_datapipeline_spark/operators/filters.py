"""Filters (SURVEY.md §2.3, F1-F16).

Every filter here is a pure Column predicate or a broadcast join — the two
shapes Catalyst can push down / broadcast. The exclusion-sink ("removed
rows go to a second writer", reference fineweb/main.py:104-140) is handled
by the pipeline composer (plans/pipeline.py), which splits on the same
predicate, so filters only *declare* predicates.

Scale notes:
- blocklist filters are LEFT ANTI joins with an explicit broadcast() of the
  small side — at 100 TB the documents side never shuffles.
- sampling/sharding is hash-based (functions/hashing.py), deterministic
  under retries and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.hashing import hash_bucket


def length_filter(text: Column, min_chars: int) -> Column:
    """F10 — keep docs with at least ``min_chars`` characters
    (reference create_excerpt.py:176-180)."""
    return F.length(text) >= F.lit(min_chars)


def threshold_lt(score: Column, threshold: float) -> Column:
    """F7 — ToxicityBinaryClassifierFilter keep-side: score < t
    (reference toxic_filter.py:157-179; per-language thresholds
    fineweb-2/main.py:36-105)."""
    return score < F.lit(threshold)


def threshold_ge(score: Column, threshold: float) -> Column:
    """F9 — CodeQualityThresholdFilter: score >= t
    (reference code_quality_filter.py:39-55)."""
    return score >= F.lit(threshold)


def conjunctive_threshold(bounds: dict[str, float]) -> Column:
    """F8 — CodeMetricsThresholdFilter: AND of lower bounds on int columns
    (reference code_quality_filter.py:28-34)."""
    pred = F.lit(True)
    for name, lo in bounds.items():
        pred = pred & (F.col(name) >= F.lit(lo))
    return pred


def valid_int(col: Column, lo: int, hi: int) -> Column:
    """F12 — coerce-to-int-else-drop + range validity
    (reference code_processing.py:15-44, pd.to_numeric(errors='coerce'))."""
    c = col.cast("string")
    i = c.try_cast("int")
    return i.isNotNull() & (i >= F.lit(lo)) & (i <= F.lit(hi))


def id_anti_join(df: DataFrame, blocklist: DataFrame, key: str = "id") -> DataFrame:
    """F1/J1 — IdFilter: drop docs whose id is in the blocklist
    (reference robots_filter.py:95-121; blocklist built by load_robots
    robots_filter.py:124-143). Broadcast LEFT ANTI — the big side stays
    shuffle-free."""
    return df.join(F.broadcast(blocklist.select(key).distinct()), key, "left_anti")


def id_semi_join(df: DataFrame, blocklist: DataFrame, key: str = "id") -> DataFrame:
    """Complement of id_anti_join — the rows the blocklist REMOVES.
    Broadcast LEFT SEMI on the same key, for FilterStep.removed_fn: the
    exclusion branch stays shuffle-free instead of going through a
    full-row exceptAll."""
    return df.join(F.broadcast(blocklist.select(key).distinct()), key, "left_semi")


def domain_blocklist_filter(df: DataFrame, domain_col: Column, blocked: DataFrame,
                            blocked_col: str = "domain") -> DataFrame:
    """F3/J3 — URLFilter with extra_domains: drop rows whose extracted host
    is blocklisted (reference dclm-edu/main.py:63-72)."""
    probe = df.withColumn("__domain", domain_col)
    out = probe.join(
        F.broadcast(blocked.select(F.col(blocked_col).alias("__domain")).distinct()),
        "__domain",
        "left_anti",
    )
    return out.drop("__domain")


#: shared sampler modulus: both samplers (and every hand-rendered
#: oracle literal) must agree on this space or they silently diverge
SAMPLE_SPACE = 1_000_003


def hash_sample(df: DataFrame, key: Column, rate: float, salt: int = 42) -> DataFrame:
    """F4 — SamplerFilter, deterministic variant: keep ``rate`` of rows by
    hash of a stable key (reference keeps w.p. rate with seed=42,
    fineweb-2/main.py:286-295). Hash-based → identical across retries,
    engines, and cluster sizes; `df.sample` is not."""
    return df.filter(
        hash_bucket(key, SAMPLE_SPACE, salt) < F.lit(int(rate * SAMPLE_SPACE)))


def shard_select(df: DataFrame, key: Column, shard: int, num_shards: int) -> DataFrame:
    """F16 — process shard i of n (reference dataset.shard,
    code_annotation.py:92)."""
    return df.filter(hash_bucket(key, num_shards) == F.lit(shard))


def quantile_gate(df: DataFrame, cols: list[str], q: float,
                  exact: bool = True, accuracy: int = 10000) -> DataFrame:
    """F13 — keep rows where ALL label columns ≥ their per-column quantile
    (reference code_filtering.py:27-29).

    Two-phase, as in the reference: one percentile aggregation (a single
    1-row result), broadcast back as a cross join, then a conjunctive
    filter. The filter is a narrow map over the fact table — no second
    shuffle.

    ``exact=True`` (oracle parity — the reference's np.quantile is exact)
    uses percentile(), whose state holds every distinct value in the final
    reducer; at 100 TB with high-cardinality doubles pass ``exact=False``
    for approx_percentile, whose sketch state is bounded by ``accuracy``.
    """
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    aggs = [F.expr(f"{fn}({c}, {q}{extra})").alias(f"__t_{c}") for c in cols]
    thresholds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(thresholds))
    pred = F.lit(True)
    for c in cols:
        pred = pred & (F.col(c) >= F.col(f"__t_{c}"))
    return out.filter(pred).drop(*[f"__t_{c}" for c in cols])


def token_count_verify(tokens: Column, expected: int) -> Column:
    """F14 — keep rows whose token array has exactly N entries
    (reference create_excerpt.py:121-125,214-218)."""
    return F.size(tokens) == F.lit(expected)


def per_key_threshold_filter(df: DataFrame, key_col: str, score: Column,
                             thresholds: dict[str, float],
                             default: float) -> DataFrame:
    """F7 full form — per-key thresholds (reference fineweb-2/main.py:36-105:
    per-language toxicity cutoffs 0.5954-0.9994; keep score < t[lang]).

    The threshold table rides along as a map literal — evaluated per row in
    codegen, no join, no shuffle.
    """
    entries = [x for k, v in thresholds.items() for x in (F.lit(k), F.lit(float(v)))]
    tmap = F.create_map(*entries)
    cutoff = F.coalesce(F.element_at(tmap, F.col(key_col)), F.lit(float(default)))
    return df.filter(score < cutoff)


def c4_line_filter(df: DataFrame, text_col: str = "text", min_words: int = 3,
                   min_lines: int = 1) -> DataFrame:
    """C4's structural clean as a document operator (Raffel et al. 2020
    §2.2): rebuild ``text_col`` from the kept lines (functions/text.
    c4_kept_lines), then drop documents that retain fewer than
    ``min_lines`` lines, contain a curly brace (code), or the phrase
    'lorem ipsum' — all narrow, codegen'd expressions; no shuffle, no UDF.

    Adds ``n_lines_kept``; replaces ``text_col`` with the cleaned text.
    """
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import c4_kept_lines

    raw = F.col(text_col)
    kept = c4_kept_lines(raw, min_words)
    out = (
        df.filter(
            ~F.contains(raw, F.lit("{"))
            & ~F.contains(F.lower(raw), F.lit("lorem ipsum"))
        )
        .withColumn("__kept", kept)
        .filter(F.size("__kept") >= F.lit(min_lines))
    )
    return (
        out.withColumn("n_lines_kept", F.size("__kept"))
        .withColumn(text_col, F.array_join("__kept", "\n"))
        .drop("__kept")
    )


def stratified_hash_sample(df: DataFrame, key: Column, strata: Column,
                           rates: dict[str, float], default_rate: float = 0.0,
                           salt: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling — `df.sampleBy` with hash
    determinism instead of RNG: each stratum keeps its own fraction
    (keep 100% of curated sources, 10% of crawl — the hand-tuned mixing
    primitive next to temperature_mix's computed rates). Strata absent
    from ``rates`` keep ``default_rate``.

    The rate map compiles to a CASE expression over integer hash
    thresholds — pure codegen, zero shuffles, retry/cluster-size stable,
    and exactly reproducible in SQL for the differential oracle."""
    thresh = F.lit(int(default_rate * SAMPLE_SPACE))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            strata == value, F.lit(int(rate * SAMPLE_SPACE))).otherwise(thresh)
    return df.filter(hash_bucket(key, SAMPLE_SPACE, salt) < thresh)
