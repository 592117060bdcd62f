"""Physical-plan audit sweep: FileScan / Exchange / ReusedExchange /
Python-stage counts for every declared query at a small sf.

The CMS triple-scan regression (fixed in r5) motivated this: a shared
subtree consumed twice without a persist re-executes per consumer, and
nothing in the correctness gate notices — wall-clock at scale does.
This sweep makes scan multiplicity visible per query so reviews can
separate "reads 3 tables" from "reads one table 3 times".

Usage: python tools/scan_audit.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from ksql_query_tutorial_spark.plans.checks import executed_plan

    rows = []
    for name, fn in entry.queries().items():
        try:
            plan = executed_plan(fn(spark, sf)).split("== Initial Plan ==")[0]
        except Exception as e:  # pragma: no cover - diagnostic tool
            rows.append((name, -1, -1, -1, -1, str(e)[:40]))
            continue
        scans_by_table: dict[str, int] = {}
        for m in re.finditer(r"FileScan parquet.*?/(\w+)\.parquet", plan):
            t = m.group(1)
            scans_by_table[t] = scans_by_table.get(t, 0) + 1
        dup = max(scans_by_table.values(), default=0)
        rows.append((
            name,
            plan.count("FileScan"),
            plan.count("Exchange hashpartitioning"),
            plan.count("ReusedExchange"),
            1 if ("ArrowEval" in plan or "FlatMapGroupsInPandas" in plan
                  or "MapInPandas" in plan or "BatchEvalPython" in plan) else 0,
            f"max-rescan={dup}",
        ))
        spark.catalog.clearCache()

    print(f"{'query':28s} {'scan':>5s} {'exch':>5s} {'reuse':>5s} "
          f"{'py':>3s}  note")
    flagged = 0
    for name, sc, ex, ru, py, note in sorted(rows):
        mark = ""
        if "max-rescan=" in note and int(note.split("=")[1]) >= 3:
            mark = "  <-- SAME TABLE SCANNED 3+x"
            flagged += 1
        print(f"{name:28s} {sc:5d} {ex:5d} {ru:5d} {py:3d}  {note}{mark}")
    print(f"\n{flagged} queries re-scan one table 3+ times")


if __name__ == "__main__":
    main()
