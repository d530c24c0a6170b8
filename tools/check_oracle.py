"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at sf0.01; compare row count, schema
(column names), an order-insensitive value multiset (floats rounded), AND
per-column physical types.

The type check exists because the driver's value hash is dtype-sensitive:
an int32 Spark column vs a BIGINT DuckDB column hash-mismatches even when
every value compares equal in Python (r4 lesson: pack_sequences /
span_dedup were value-identical but driver-red). Both sides are mapped to
a normalized Arrow-ish type name; a DuckDB HUGEINT (decimal128) therefore
fails against a Spark bigint, as it should.

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

# Spark simpleString -> normalized physical type
_SPARK_T = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "binary": "binary",
    "date": "date",
}


def norm_spark_type(t: str) -> str:
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith(("array", "struct", "map", "decimal")):
        return t
    return _SPARK_T.get(t, t)


def norm_arrow_type(t) -> str:
    s = str(t)
    if s in ("double",):
        return "float64"
    if s in ("float",):
        return "float32"
    if s in ("large_string", "string_view"):
        return "string"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "date32[day]":
        return "date"
    return s


def canon(v):
    if isinstance(v, float):
        r = round(v, ROUND)
        return 0.0 if r == 0 else r  # -0.0 == 0.0
    if isinstance(v, int):
        return int(v)
    return v


def multiset(rows):
    return Counter(tuple(canon(v) for v in row) for row in rows)


def oracle_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_one(spark, con, fn, sql_text, sf_dir):
    """Run one Spark entry + its DuckDB twin, compare the way the driver
    does (count, sorted-column schema, normalized physical types,
    rounded value multiset). Returns a result dict; res['ok'] is the
    driver-green prediction."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    stypes = {c: norm_spark_type(t) for c, t in sdf.dtypes}
    otbl = con.execute(sql_text).fetch_arrow_table()
    ocols = otbl.column_names
    otypes = {f.name: norm_arrow_type(f.type) for f in otbl.schema}
    orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
    # driver sorts columns by name before hashing
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    sm = multiset([tuple(r[i] for i in sidx) for r in srows])
    om = multiset([tuple(r[i] for i in oidx) for r in orows])
    ok_schema = sorted(scols) == sorted(ocols)
    type_mismatch = (
        {c: (stypes[c], otypes[c]) for c in scols if stypes.get(c) != otypes.get(c)}
        if ok_schema
        else {}
    )
    ok_types = ok_schema and not type_mismatch
    return {
        "ok": ok_schema and ok_types and len(srows) == len(orows) and sm == om,
        "n_spark": len(srows),
        "n_oracle": len(orows),
        "ok_schema": ok_schema,
        "ok_types": ok_types,
        "type_mismatch": type_mismatch,
        "ok_vals": sm == om,
        "spark_only": list((sm - om))[:3],
        "oracle_only": list((om - sm))[:3],
        "scols": scols,
        "ocols": ocols,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cpus=16)
    con = oracle_connection(sf_dir)
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in osql:
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} rows-only: {n} rows  (no oracle)")
            continue
        res = check_one(spark, con, fn, osql[name], sf_dir)
        status = "OK" if res["ok"] else "FAIL"
        schema_msg = (
            "ok"
            if res["ok_schema"]
            else f"{sorted(res['scols'])} vs {sorted(res['ocols'])}"
        )
        print(
            f"{name:28s} {status}  spark={res['n_spark']} duck={res['n_oracle']} "
            f"schema={schema_msg} "
            f"types={'ok' if res['ok_types'] else res['type_mismatch']} "
            f"values={'ok' if res['ok_vals'] else 'MISMATCH'}"
        )
        if not res["ok"]:
            failures.append(name)
            for r in res["spark_only"]:
                print(f"    spark-only: {r}")
            for r in res["oracle_only"]:
                print(f"    duck-only:  {r}")
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall checked queries match")


if __name__ == "__main__":
    main()
