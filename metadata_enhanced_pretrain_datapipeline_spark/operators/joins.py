"""Join strategies (SURVEY.md §2.6) including the as-of extension.

The reference's joins are all broadcast lookups (robots id-set, domain
dict); the engine exposes the full Spark join surface and adds an as-of
join. Strategy guidance baked into each helper:

- dimension tables (region/nation/customer at documents-scale) →
  `broadcast()` — at 100 TB the fact table must never shuffle for a
  kilobyte dimension.
- fact⋈fact → sort-merge with AQE skew splitting (default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(fact: DataFrame, dim: DataFrame, on: str | list[str],
                     how: str = "left") -> DataFrame:
    """J2 — dict-lookup join (domain → robots.txt content,
    dclm-edu/main.py:75-77 + robots_filter.py:44-58)."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(left: DataFrame, right: DataFrame, left_key: str, right_key: str,
              left_ts: str, right_ts: str, right_vals: list[str]) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts on the same key (extension — q_asof_event_join).

    Physical shape (the scalable one, per SURVEY §2.6): UNION the two
    streams tagged by side, one window sorted by (key, ts) carrying
    last_value(right_vals) forward, then keep left rows. ONE shuffle on the
    key — vs a naive join+filter+argmax which shuffles the cross product.
    """
    clash = set(right_vals) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_vals {sorted(clash)} collide with left columns — the "
            "output would carry duplicate names and every downstream "
            "reference would be ambiguous; alias the right columns first"
        )
    rstruct_type = F.struct(*[right[v] for v in right_vals])
    lt = left.select(
        F.col(left_key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(right.select(rstruct_type.alias("s")).schema["s"].dataType).alias("__r"),
    )
    rt = right.select(
        F.col(right_key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"), F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        F.struct(*[F.col(v) for v in right_vals]).alias("__r"),
    )
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at equal ts (side 0 < 1) so an order
    # landing exactly at the event ts is visible to it (<=, asof semantics).
    # The right row travels as ONE struct: carrying columns independently
    # with ignorenulls would stitch fields from DIFFERENT right rows when
    # values are NULL. The struct in the ordering also makes duplicate
    # (key, ts) ties deterministic (greatest tuple wins).
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__c")
    ).filter(F.col("__side") == 1)
    return carried.select(
        F.col("__l.*"), *[F.col(f"__c.{v}").alias(v) for v in right_vals]
    )


def salted_join(left: DataFrame, right: DataFrame, on: str, how: str = "inner",
                salt_buckets: int = 8,
                strategy: str = "merge") -> DataFrame:
    """Skew-salted equi-join: spread a hot key over ``salt_buckets``
    sub-keys by salting the BIG side with a per-row hash and replicating
    the small side once per salt value (explode(sequence) — no shuffle to
    replicate).

    WHEN TO USE (A/B-measured, SCALE.md "AQE skew-join vs salted_join",
    sf10 = 42M hot rows): prefer the plain join + AQE skew split FIRST —
    when the split fires it beats this operator (7.9s vs 29.5s at sf10:
    AQE duplicates only the hot key's other-side rows, salting
    replicates the WHOLE small side salt_buckets×). Reach for the
    explicit salt when:

    - the skewed shuffle is row-heavy but BYTE-light: AQE's detection
      thresholds on compressed map-output bytes, so a narrow hot
      partition (constant key + small ints after column pruning —
      count/sum shapes, key-only probes) never trips it even at 42M
      rows in one partition; there the salt measured 10.6s vs
      16.9-20.2s un-split;
    - the skew feeds windows/stateful operators AQE cannot re-plan;
    - the plan must be deterministic (no runtime re-plan).

    Result is identical to a plain join (tested). Only left-oriented
    joins are valid: for right/full joins the replicated right side
    would emit its unmatched rows once per salt.

    The join strategy is PINNED — never left to Catalyst: it
    size-estimates the right side BEFORE the explode (Generate doesn't
    scale stats), so it happily broadcasts the salt_buckets×-replicated
    relation — measured 6.7× slower at 10× data, and a driver OOM at
    real scale. A salted join's contract is precisely the
    can't-broadcast case (a broadcastable right side needs no salt:
    broadcast joins have no skew).

    The default pin is ``merge`` (sort-merge): its build SPILLS, so it
    survives any build-size-to-task-memory ratio, and it measured
    equal-at-small / 3.1×-faster-at-large than the shuffled-hash pin
    (SCALE.md sf10 probe: SHJ 42s — and an outright OOM at 250 MB/core
    — vs SMJ 13.5s on the same 60M⋈15M salted join; within noise at
    sf1.0). ``strategy="shuffle_hash"`` remains for the narrow case —
    a small, BOUNDED per-salt build with plentiful per-core memory,
    where skipping the sort wins."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports left-oriented joins only, got {how!r}")
    if strategy not in ("shuffle_hash", "merge"):
        raise ValueError(
            f"strategy must be 'shuffle_hash' or 'merge', got {strategy!r} "
            "(broadcast is exactly what a salted join must never do)")
    if salt_buckets < 1:
        # % 0 throws under ANSI / yields NULL otherwise, and sequence(0,-1)
        # DESCENDS — either way the join silently degenerates
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    salt = (F.shiftrightunsigned(F.xxhash64(F.monotonically_increasing_id()), 1)
            % F.lit(salt_buckets))
    lsalted = left.withColumn("__salt", salt.cast("int"))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return lsalted.join(rsalted.hint(strategy), [on, "__salt"], how).drop("__salt")


def range_join(points: DataFrame, pt_col: str, intervals: DataFrame,
               start_col: str, end_col: str, bin_width: float,
               max_bins_per_interval: int = 4096,
               strategy: str = "auto") -> DataFrame:
    """Interval/range join: every (point, interval) pair with
    ``start <= point <= end`` (inclusive both ends) — the custom-operator
    pattern for numeric/temporal containment (extension; the prompt's
    canonical example alongside as-of).

    Catalyst plans a naive ``ON pt BETWEEN start AND end`` as a
    nested-loop over the cross product — quadratic and un-shuffleable.
    The scalable shape BINS the number line: each interval explodes to
    the bins it overlaps, each point lands in exactly ONE bin, and the
    equi-join on bin carries the exact BETWEEN as a post-filter. One
    hash shuffle keyed by bin; no duplicate pairs (one bin per point).
    Pick ``bin_width`` near the typical interval length: wider bins
    mean fewer replicas but more false candidates for the post-filter.

    An interval spanning more than ``max_bins_per_interval`` bins fails
    fast (assert inside the filter, which column pruning cannot elide) —
    a degenerate [0, +inf)-style interval would otherwise replicate
    across the whole axis.

    ``strategy``: ``'auto'`` (default) lets Catalyst choose — right when
    the interval table is genuinely small (the common case: broadcast,
    zero shuffle on the points). BUT Catalyst size-estimates the interval
    side BEFORE the bin explode (Generate does not scale stats, the same
    hazard measured on salted_join), so a large interval table can be
    underestimated by up to ``max_bins_per_interval``× and mis-broadcast
    — pass ``'shuffle'`` to pin a ShuffledHashJoin when the interval side
    is big or its width distribution is unknown.
    """
    if strategy not in ("auto", "shuffle"):
        raise ValueError(f"strategy must be 'auto' or 'shuffle', got {strategy!r}")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"point/interval column names collide: {sorted(clash)} — "
            "alias one side first, the output carries both"
        )
    # BETWEEN with a NULL/NaN bound never matches: drop such intervals
    # BEFORE the width guard, which would otherwise assert-crash on them
    # (NULL/NaN comparisons fall into the otherwise branch)
    types = dict(intervals.dtypes)

    def finite(col_name: str) -> Column:
        c = F.col(col_name).isNotNull()
        if types[col_name] in ("double", "float"):
            c = c & ~F.isnan(F.col(col_name))
        return c

    intervals = intervals.filter(finite(start_col) & finite(end_col))
    b0 = F.floor(F.col(start_col) / F.lit(bin_width))
    b1 = F.floor(F.col(end_col) / F.lit(bin_width))
    ok = (b1 - b0) < F.lit(max_bins_per_interval)
    guarded = intervals.filter(
        F.when(ok, F.lit(True)).otherwise(
            F.assert_true(
                F.lit(False),
                F.lit(f"range_join: interval wider than "
                      f"{max_bins_per_interval} bins — raise bin_width "
                      f"or split the interval"),
            ).isNull()
        )
    )
    iv = guarded.withColumn("__bin", F.explode(F.sequence(b0, b1)))
    if strategy == "shuffle":
        iv = iv.hint("shuffle_hash")
    pts = points.withColumn("__bin", F.floor(F.col(pt_col) / F.lit(bin_width)))
    return (
        pts.join(iv, "__bin")
        .filter((F.col(pt_col) >= F.col(start_col))
                & (F.col(pt_col) <= F.col(end_col)))
        .drop("__bin")
    )


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """MERGE-style upsert: every key present in ``updates`` takes the
    update row; all other base rows pass through — the incremental
    metadata-refresh shape (re-annotated quality scores, recrawled pages)
    without a table format's MERGE INTO.

    Plan: base anti-joins the updates' key set (ids only — AQE broadcasts
    when small), then unions the updates verbatim. One shuffle at most;
    at 100 TB pair with a partition-aligned write so only touched
    partitions rewrite. Schemas must match (unionByName enforces it
    loudly rather than silently reordering)."""
    keys = updates.select(*key_cols).distinct()
    kept = base.join(keys, key_cols, "left_anti")
    return kept.unionByName(updates)
