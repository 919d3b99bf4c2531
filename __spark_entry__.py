"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline-shaped query at sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY.md §2 inventory, backed by
the metadata_enhanced_pretrain_datapipeline_spark package (see
metadata_enhanced_pretrain_datapipeline_spark/queries.py for the registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metadata_enhanced_pretrain_datapipeline_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (fineweb pipeline shape:
    blocklist anti-join → filters → PII annotate → per-source stats)."""
    return _q.all_queries()["q_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    †-queries (model/stateful/banding semantics) are intentionally absent
    → rows-only check."""
    return _q.all_oracles()
