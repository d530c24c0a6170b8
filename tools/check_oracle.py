"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01; compare row count, schema
(column names), and an order-insensitive value multiset (floats rounded).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from faiss_spark.session import TABLES, get_spark

ROUND = 6


def canon(v):
    if isinstance(v, float):
        r = round(v, ROUND)
        return 0.0 if r == 0 else r  # -0.0 == 0.0
    if isinstance(v, int):
        return int(v)
    return v


def multiset(rows):
    return Counter(tuple(canon(v) for v in row) for row in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in osql:
            print(f"{name:28s} rows-only: {len(srows)} rows  (no oracle)")
            continue
        ores = con.execute(osql[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        # driver sorts columns by name before hashing
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sm = multiset([tuple(r[i] for i in sidx) for r in srows])
        om = multiset([tuple(r[i] for i in oidx) for r in orows])
        ok_schema = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = sm == om
        status = "OK" if (ok_schema and ok_count and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status}  spark={len(srows)} duck={len(orows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"values={'ok' if ok_vals else 'MISMATCH'}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_vals:
                diff_s = sm - om
                diff_o = om - sm
                for r in list(diff_s)[:3]:
                    print(f"    spark-only: {r}")
                for r in list(diff_o)[:3]:
                    print(f"    duck-only:  {r}")
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall checked queries match")


if __name__ == "__main__":
    main()
