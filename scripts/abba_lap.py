"""Quiet-window A/B lap for adjudicating bench deltas between two
checkouts of this repo (VERDICT r5 #2): run the named queries from the
package at ``repo_root`` with bench.py's exact measurement (noop sink,
warmup + best-of-2) and print one JSON line. Drive it in an ABBA
pattern from the shell — alternate roots so slow host drift cancels:

    python scripts/abba_lap.py <repo_root> <sf_dir> <query> [query ...]

Each invocation is one fresh JVM, so JIT/IO-cache state is symmetric
across roots (the warmup lap inside absorbs first-run costs).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    root, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sys.path.insert(0, root)

    from bench import timed_laps  # the ONE lap protocol (bench.py)
    from metadata_enhanced_pretrain_datapipeline_spark import queries as q
    from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

    spark = get_spark("abba")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.all_queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = registry[name]
        out[name] = timed_laps(
            lambda: fn(spark, sf_dir).write.format("noop")
            .mode("overwrite").save()
        )
    print(json.dumps({"root": root, "sf_dir": sf_dir, "laps": out}))


if __name__ == "__main__":
    main()
