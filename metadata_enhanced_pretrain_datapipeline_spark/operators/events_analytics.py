"""Event-stream analytics: ordered funnels and cohort retention.

The engine's events table gets the two classic product-analytics
aggregations on top of the existing window/sessionize family — both as
pure DataFrame plans:

- :func:`funnel_counts` — how many users completed stage1 -> stage2 ->
  stage3 IN ORDER (each stage strictly after the previous one's first
  completion). Decorrelates into per-stage conditional min-aggregates
  joined user-wise: k aggs + k-1 user-keyed joins of shrinking user
  sets (AQE broadcasts them when they fit — never forced, since the
  stage-1 set can be every user on the platform), no
  per-user sorting, no collect_list of event histories (which at 100 TB
  would materialize a power user's million events into one row).
- :func:`cohort_retention` — users bucketed by first-seen week, counted
  by week offset since their cohort. Week indexing is integral epoch
  arithmetic (``epoch_sec div 604800``), not calendar functions, so the
  result is engine-portable and timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_SECONDS = 604_800


def funnel_counts(events: DataFrame, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """(stage, n_users) for each prefix of ``stages`` completed in order.
    A user counts for stage k when they have an event of type k strictly
    after their earliest qualifying chain through stages 1..k-1 (earliest
    completion is the standard greedy funnel semantics and provably
    maximizes reach at every stage)."""
    reached = None  # DataFrame[user, t_k]: earliest completion of stage k
    out_parts = []
    for k, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage)
        if reached is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        else:
            cur = (
                ev.join(reached.withColumnRenamed("t", "prev_t"), user_col)
                .filter(F.col(ts_col) > F.col("prev_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t"))
            )
        reached = cur
        out_parts.append(
            cur.agg(
                F.lit(k + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count("*").alias("n_users"),
            )
        )
    res = out_parts[0]
    for p in out_parts[1:]:
        res = res.unionByName(p)
    return res


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct users of each
    first-seen-week cohort active at each week offset. Two shuffles —
    per-user min (map-side combined) and the final (cohort, offset)
    count-distinct over the already user-distinct activity set."""
    week = (F.unix_micros(F.col(ts_col).cast("timestamp"))
            / F.lit(1_000_000)).cast("long") / F.lit(WEEK_SECONDS)
    events_w = events.select(user_col, F.floor(week).cast("long").alias("week"))
    first = events_w.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    act = (
        events_w.join(first, user_col)
        .select(user_col, "cohort_week",
                (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users"))
