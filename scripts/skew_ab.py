"""AQE-skew-join vs explicit salted_join adjudication (VERDICT r6 #6).

session.py enables spark.sql.adaptive.skewJoin; operators/joins.py
hand-salts. This A/B measures, on ONE manufactured hot-key join in one
JVM (confs are runtime-settable, so the laps interleave inside a single
host-noise window), when Spark's built-in skew splitting suffices and
when the explicit salt is still required.

The workload: lineitem with 70% of rows collapsed onto one hot key
(k = 42 when l_orderkey % 10 < 7) joined to the orders key dimension.
Broadcast is disabled for the plain variants — the scenario under test
is precisely the right-side-too-big-to-broadcast case (a broadcastable
right side has no skew problem at all: broadcast joins don't shuffle
the left).

Variants:
  plain_noskew   join, AQE skew-split OFF  (the baseline that suffers)
  plain_aqeskew  join, AQE skew-split ON   (Spark's built-in lever)
  salted         joins.salted_join(salt_buckets=8, merge pin)

Each variant reports best-of-2 laps (bench.timed_laps) and whether the
final adaptive plan actually split the skewed partition ("skew=true" in
the SMJ node).

Usage:
    SPARK_DRIVER_MEMORY=48g python scripts/skew_ab.py .scale/sf1.0
    SPARK_DRIVER_MEMORY=48g python scripts/skew_ab.py .scale/sf10
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import joins
from metadata_enhanced_pretrain_datapipeline_spark.queries import load
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew-ab")
    spark.sparkContext.setLogLevel("ERROR")

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumn(
        "k",
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(42))
        .otherwise(F.col("l_orderkey")),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority")

    def agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("long").alias("qty"))

    def run_plain():
        agg(li.join(o, "k")).write.format("noop").mode("overwrite").save()

    def run_salted():
        agg(joins.salted_join(li, o, on="k", salt_buckets=8)) \
            .write.format("noop").mode("overwrite").save()

    def final_plan(df):
        # collect() (5 result rows), NOT a noop write: the write wraps the
        # plan in its own query execution, so the frame's own QE would
        # still show the UNEXECUTED initial plan (isFinalPlan=false) and
        # any skew-split marker would be invisible
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    results = {}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_noskew"] = {"laps": timed_laps(run_plain)}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["plain_aqeskew"] = {"laps": timed_laps(run_plain)}
    plan = final_plan(agg(li.join(o, "k")))
    results["plain_aqeskew"]["skew_split_in_plan"] = "skew=true" in plan

    # the byte-blind case: a count-only aggregate lets Catalyst prune
    # every payload column, so the hot partition is 42M ROWS but (being
    # one constant long, lz4'd) almost no BYTES — AQE's skew detection
    # thresholds on compressed bytes and never fires, though the
    # single-task sort cost is just as real. Exactly the shape where the
    # explicit salt stays necessary.
    count_only = (li.join(o, "k").groupBy("o_orderpriority")
                  .agg(F.count("*").alias("n")))
    results["aqeskew_fires_count_only"] = \
        "skew=true" in final_plan(count_only)

    results["salted"] = {"laps": timed_laps(run_salted)}

    # second ABBA leg: re-measure the first variant so window drift is
    # visible in the artifact itself
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["plain_noskew_again"] = {"laps": timed_laps(run_plain)}

    for name, r in results.items():
        if isinstance(r, dict) and "laps" in r:
            r["best"] = min(r["laps"])
    hot = li.filter(F.col("k") == 42).count()
    total = li.count()
    print(json.dumps({"sf_dir": sf_dir, "hot_rows": hot,
                      "total_rows": total, "results": results}), flush=True)


if __name__ == "__main__":
    main()
