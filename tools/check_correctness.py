"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
twin on DuckDB against the same parquet tables, then compare row
count, column-name set, and (column-name-sorted, row-sorted) values
with float tolerance.

Usage:
    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)
    return names, data


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from ksql_query_tutorial_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {e}")
            failures.append(name)
            continue
        if sql is None:
            print(f"skip {name}: no_oracle ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb err {e}")
            failures.append(name)
            continue
        sn, sd = _canon(scols, srows)
        on, od = _canon(ocols, orows)
        if len(sd) != len(od):
            print(f"FAIL {name}: rows {len(sd)} vs {len(od)}")
            failures.append(name)
        elif sn != on:
            print(f"FAIL {name}: cols {sn} vs {on}")
            failures.append(name)
        elif sd != od:
            bad = next(i for i, (a, b) in enumerate(zip(sd, od)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:\n"
                  f"  spark  {sd[bad]}\n  oracle {od[bad]}")
            failures.append(name)
        else:
            print(f"ok   {name} ({len(sd)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
