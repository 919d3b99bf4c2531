"""Dump ONE label-propagation round's physical plan for
duplicate_clusters (r13, VERDICT r12 item 8): the r12 self-loop fold
claims each round is TWO joins (neighbor-min over the self-looped edge
list + the pointer jump) where the r11 shape ran THREE (neighbor-min,
a labels-combine left join, the jump). The query-level plan dumps
cannot show this — the iterative loop localCheckpoints each round, so
the tail plan contains no joins at all. This script builds one round's
DataFrame from a materialized graph in BOTH shapes and dumps
.explain("formatted") to plans/r13/duplicate_clusters_round_{old,new}.txt.

    python scripts/dump_cluster_round_plan.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("cluster-round-plan")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a long, id_b long")
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    ).localCheckpoint()
    nodes = edges.select(F.col("src").alias("id")).distinct().localCheckpoint()
    labels = nodes.withColumn("label", F.col("id")).localCheckpoint()

    # NEW shape (r12+): self-loop edges fold the own-label term into the
    # neighbor-min join — one graph join + the pointer jump per round.
    edges_sl = edges.union(
        nodes.select(F.col("id").alias("src"), F.col("id").alias("dst")))
    propagated = (
        edges_sl.join(labels, edges_sl["dst"] == labels["id"])
        .groupBy("src").agg(F.min("label").alias("label"))
        .select(F.col("src").alias("id"), "label")
    )
    jump = propagated.select(
        F.col("id").alias("__jid"), F.col("label").alias("__jlabel"))
    stepped_new = (
        propagated.join(jump, propagated["label"] == jump["__jid"], "left")
        .select(
            propagated["id"],
            F.least(F.col("label"),
                    F.coalesce(F.col("__jlabel"), F.col("label"))).alias("label"),
        )
    )

    # OLD shape (r11): neighbor-min over the bare edges, then a
    # labels-combine LEFT join to fold min(own, neighbor) and carry the
    # pre-round label, then the pointer jump — three joins per round.
    nbr = (
        edges.join(labels, edges["dst"] == labels["id"])
        .groupBy("src").agg(F.min("label").alias("__nbr"))
        .select(F.col("src").alias("__nid"), "__nbr")
    )
    combined = (
        labels.join(nbr, labels["id"] == F.col("__nid"), "left")
        .select(
            labels["id"],
            F.least(F.col("label"),
                    F.coalesce(F.col("__nbr"), F.col("label"))).alias("label"),
            F.col("label").alias("__old"),
        )
    )
    jump_o = combined.select(
        F.col("id").alias("__jid"), F.col("label").alias("__jlabel"))
    stepped_old = (
        combined.join(jump_o, combined["label"] == jump_o["__jid"], "left")
        .select(
            combined["id"],
            F.least(F.col("label"),
                    F.coalesce(F.col("__jlabel"), F.col("label"))).alias("label"),
            "__old",
        )
    )

    os.makedirs("plans/r13", exist_ok=True)
    for tag, df in (("new", stepped_new), ("old", stepped_old)):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = f"plans/r13/duplicate_clusters_round_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        n_joins = plan.count("Join")
        print(f"wrote {out} ({len(plan)} chars, {n_joins} 'Join' mentions)")


if __name__ == "__main__":
    main()
