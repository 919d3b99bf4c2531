"""Round-end driver mimic: run the FIRST ~50 emitted queries in a
VANILLA SparkSession (none of the engine's confs at build time — entry
points must self-configure via tune_for_oracle, exactly like the
driver's own session) and differential-check them against the DuckDB
oracles. Usage:

    python scripts/vanilla_check.py [sf_dir] [n]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

import check_oracle as co  # reuse canon/rowset/type tables
import __spark_entry__ as entry_mod
import duckdb


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = SparkSession.builder.master("local[32]").getOrCreate()  # VANILLA
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    head = list(qs)[:n]
    npass = nfail = nrows = 0
    for name in head:
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"FAIL  {name}: spark error: {e}")
            nfail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            nrows += 1
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(orows)}")
            nfail += 1
            continue
        if co.rowset(scols, srows) != co.rowset(ocols, orows):
            print(f"FAIL  {name}: values differ")
            nfail += 1
            continue
        npass += 1
        print(f"ok    {name}: {len(srows)} rows")
    print(f"\nvanilla first-{n}: {npass} passed, {nfail} failed, {nrows} rows-only")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
