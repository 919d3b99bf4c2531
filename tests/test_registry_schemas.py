"""Driver-contract guard (VERDICT r4 #4): every oracle-backed query must
emit only scalar top-level columns. The external driver canonicalizes
results with a pandas ``sort_values`` over all output columns, which
raises ``unhashable type: 'list'`` on ArrayType/MapType values — that is
exactly how CORRECTNESS_r04's two red rows (q_inverted_index,
q_flag_violations) happened despite both being locally oracle-green.

Builds every registered query's plan at sf0.001 and inspects the schema.
†-queries (no oracle) are exempt: the driver's rows-only check never
hashes their values.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from metadata_enhanced_pretrain_datapipeline_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"


def _has_container(dt: T.DataType) -> bool:
    """True if the type contains an array/map ANYWHERE — a Row wrapping a
    list is just as unhashable for the driver's pandas sort as a bare
    list, so struct fields recurse."""
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return True
    if isinstance(dt, T.StructType):
        return any(_has_container(f.dataType) for f in dt.fields)
    return False


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_no_array_or_map_output_in_oracle_backed_queries(spark):
    oracles = q.all_oracles()
    offenders: list[str] = []
    errors: list[str] = []
    for name, fn in q.all_queries().items():
        if name not in oracles:
            continue  # rows-only by design: values never hashed
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception as e:  # build failure is its own red flag
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        bad = [
            f.name for f in schema.fields if _has_container(f.dataType)
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not errors, f"queries failed to build at sf0.001: {errors}"
    assert not offenders, (
        "oracle-backed queries with array/map output columns (the driver's "
        f"pandas canonicalizer cannot hash these): {offenders}"
    )
