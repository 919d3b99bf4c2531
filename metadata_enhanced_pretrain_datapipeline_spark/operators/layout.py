"""Write-layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping.

Parquet readers prune row groups/files on min-max column stats, but a
sort on (a, b) only localizes ``a`` — predicates on ``b`` alone touch
every file. Interleaving the bits of both keys into one Morton key and
range-sorting on it bounds EVERY file to a small rectangle in (a, b)
space, so selective predicates on either dimension (or both) skip most
files. This is the layout step a 100 TB events/documents store runs
before its final write (the same idea behind Delta/Iceberg OPTIMIZE
ZORDER, built here from plain Spark expressions).

The key is a pure JVM expression chain (shift/and/or — whole-stage
codegen, no UDF), and the layout is ``repartitionByRange(n, z) +
sortWithinPartitions(z)``: one range shuffle, each output file a
contiguous Z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two NON-NEGATIVE ints:
    x occupies even bit positions, y odd. bits<=31 keeps the result
    (2*bits wide) comfortably inside a long under ANSI mode. Callers
    clamp/scale their dimensions into range first (stats-friendly
    bucketing beats exactness here — the key orders files, it is not
    data)."""
    # disjoint bit positions → SUM is bitwise-OR (and Column `|` is
    # boolean OR in pyspark, so addition is also the clean spelling)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB rendering of :func:`zorder_key` (bit-identical for
    non-negative inputs; used by the differential oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(df: DataFrame, x: Column, y: Column, num_files: int,
                  bits: int = 16, key_col: str = "__z") -> DataFrame:
    """Cluster rows for writing: range-partition on the Morton key into
    ``num_files`` partitions and sort within each, so every output file's
    (x, y) min-max stats cover one small rectangle. Pair with
    ``write.option('maxRecordsPerFile', ...)`` for size control; drop
    ``key_col`` at write time if the key itself need not persist."""
    keyed = df.withColumn(key_col, zorder_key(x, y, bits))
    return keyed.repartitionByRange(num_files, key_col).sortWithinPartitions(key_col)
