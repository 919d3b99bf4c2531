"""Declarative data-quality expectations — the validation gate a
pretraining pipeline runs after ingest and before expensive stages
(the relational generalization of the reference's scattered per-filter
sanity checks, e.g. valid-int dropna in finemath/main.py and the
token-count verify in create_excerpt.py).

A rule is ``(name, Column predicate that GOOD rows satisfy)``. Both
entry points are single-scan, pure-JVM expressions:

- :func:`expectation_summary` — ONE aggregation pass computing per-rule
  violation counts over the whole corpus (conditional sums — adding a
  rule adds a column to the same partial agg, not a job).
- :func:`flag_violations` — per-row array of failed rule names, for
  routing into an exclusion sink (plans/pipeline.FilterStep) or
  quarantine partition.

At 100 TB: the summary is a map-side-combined scalar agg (bytes move,
not rows); flagging is a projection — zero shuffles either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_summary(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """One row per rule: (rule, n_violations, passed). NULL predicate
    results count as violations (an expectation must hold provably)."""
    # coalesce(sum, 0): an EMPTY corpus violates nothing — sum over zero
    # rows is NULL, which would read as "unknown" instead of a pass
    aggs = [
        F.coalesce(
            F.sum(F.when(F.coalesce(cond.cast("boolean"), F.lit(False)), 0)
                  .otherwise(1)),
            F.lit(0),
        ).alias(name)
        for name, cond in rules
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(name).cast("long").alias("n_violations"),
                )
                for name, _ in rules
            ])
        ).alias("r")
    )
    return stacked.select(
        "r.rule", "r.n_violations", (F.col("r.n_violations") == 0).alias("passed")
    )


def flag_violations(df: DataFrame, rules: list[tuple[str, Column]],
                    out_col: str = "failed_rules") -> DataFrame:
    """Append an array column naming every rule the row violates (empty
    array = clean row). Compose with a filter on ``size(out_col) > 0``
    for the quarantine branch and ``= 0`` for the pass branch."""
    flags = F.array(*[
        F.when(~F.coalesce(cond.cast("boolean"), F.lit(False)), F.lit(name))
        for name, cond in rules
    ])
    return df.withColumn(out_col, F.filter(flags, lambda x: x.isNotNull()))
