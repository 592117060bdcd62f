"""Global plan-hygiene sweep: build EVERY declared query's physical
plan at sf0.001 and report, per query, which out-of-codegen stage
kinds it contains:

- ``BatchEvalPython``  — row-at-a-time Python UDF. Banned everywhere
  (the brief's "UDFs are the slow path" rule); the repo's Python is
  Arrow-vectorized only.
- ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas`` /
  ``FlatMapGroupsInPandasWithState`` — Arrow-batched Python. Allowed,
  but only where the operator's semantics genuinely need it (sketch
  signatures, pairwise numpy scoring, multimodal byte decoding); the
  sweep makes the full Python surface explicit so a regression (a
  JVM-expressible op silently growing a Python stage) is visible.
- ``CartesianProduct`` — non-broadcast cartesian join. Banned except
  on intentionally-quadratic capped calibration readouts.
- ``BroadcastNestedLoopJoin`` — broadcast cartesian; fine for
  one-row/bounded scalar attaches, reported for audit.

Usage: ``python tools/plan_hygiene_sweep.py [sf_dir]`` — prints one
line per query with its stage kinds, then a summary. The codified
invariants live in ``tests/test_plan_hygiene.py``; this tool is the
discovery/refresh path when operators are added.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.plans.checks import formatted_plan  # noqa: E402
from ksql_query_tutorial_spark.session import get_spark  # noqa: E402

STAGES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
    "FlatMapGroupsInPandas",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-hygiene-sweep", cpus="8")

    import __spark_entry__ as em

    qs = em.queries()
    by_stage: dict[str, list[str]] = {s: [] for s in STAGES}
    errors: list[str] = []
    for name in sorted(qs):
        try:
            plan = formatted_plan(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append(f"{name}: {type(e).__name__}: {e}")
            print(f"{name}: PLAN ERROR {e}")
            continue
        found = [s for s in STAGES if s in plan]
        # ArrowEvalPython is a substring-disjoint stage name, but
        # FlatMapGroupsInPandasWithState contains FlatMapGroupsInPandas:
        # report the most specific only.
        if (
            "FlatMapGroupsInPandasWithState" in found
            and "FlatMapGroupsInPandas" in found
            and "FlatMapGroupsInPandas(" not in plan
        ):
            found.remove("FlatMapGroupsInPandas")
        for s in found:
            by_stage[s].append(name)
        print(f"{name}: {','.join(found) if found else 'jvm-only'}")
        spark.catalog.clearCache()

    print("\n=== summary ===")
    for s in STAGES:
        print(f"{s}: {len(by_stage[s])} -> {sorted(by_stage[s])}")
    print(f"errors: {errors if errors else 'none'}")


if __name__ == "__main__":
    main()
