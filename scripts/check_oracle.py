"""Local driver-mimic: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB, compare row counts + column names +
order-insensitive values. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"  # 12 sig digits: catches 0.01-level drift on 1e9-scale aggregates, hides ulp noise
    if isinstance(v, bool):
        return str(int(v))
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


_SPARK_T = {"bigint": "i64", "int": "i32", "smallint": "i32", "double": "f64",
            "float": "f64", "string": "str", "boolean": "bool"}
_DUCK_T = {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i32", "DOUBLE": "f64",
           "FLOAT": "f64", "VARCHAR": "str", "BOOLEAN": "bool", "HUGEINT": "i128"}


def canon_types(pairs, table):
    out = {}
    for name, t in pairs:
        t = str(t)
        out[name] = table.get(t, table.get(t.split("(")[0], t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    passed, failed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(srows)))
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failed.append((name, f"cols spark={sorted(scols)} duck={sorted(ocols)}"))
            print(f"FAIL  {name}: column mismatch spark={sorted(scols)} duck={sorted(ocols)}")
            continue
        stypes = canon_types(sdf.dtypes, _SPARK_T)
        desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        otypes = canon_types([(d[0], d[1]) for d in desc], _DUCK_T)
        mism = {c: (stypes[c], otypes[c]) for c in stypes
                if c in otypes and stypes[c] != otypes[c]
                and {stypes[c], otypes[c]} <= {"i32", "i64", "i128", "f64", "str", "bool"}}
        if mism:
            failed.append((name, f"dtype mismatch {mism}"))
            print(f"FAIL  {name}: dtype mismatch {mism}")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"rows spark={len(srows)} duck={len(orows)}"))
            print(f"FAIL  {name}: row count spark={len(srows)} duck={len(orows)}")
            continue
        s, o = rowset(scols, srows), rowset(ocols, orows)
        if s != o:
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            failed.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ, first diffs: {diff}")
            continue
        passed.append(name)
        print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    if failed:
        print("failed:", [f[0] for f in failed])
        sys.exit(1)


if __name__ == "__main__":
    main()
