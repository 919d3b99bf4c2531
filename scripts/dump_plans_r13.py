"""Dump .explain("formatted") for named queries to plans/r13/<q>_<tag>.txt.

Usage: python scripts/dump_plans_r13.py <tag> <query> [query ...]
Tag is "before" or "after". Queries with eager build work (store writes,
stream drains) execute that work while the plan is built — expected.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from metadata_enhanced_pretrain_datapipeline_spark import queries as q
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("plans-r13")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.all_queries()
    os.makedirs("plans/r13", exist_ok=True)
    for name in names:
        df = registry[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r13/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(f"wrote plans/r13/{name}_{tag}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
