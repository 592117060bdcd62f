"""sf1 scaling check: run the tutorial queries (q01-q28) at sf0.1 and
at the 10x-replicated sf1 fixture (tools/gen_sf1.py), report per-query
wall times and the sf1/sf0.1 ratio, and verify the bounded-dimension
broadcasts survive the scale-up under AQE.

A ratio <= ~10 is linear (10x the rows); well under 10 means fixed
per-query overhead still dominates at sf1. Usage:
    python tools/gen_sf1.py .stress/sf1   # once
    python tools/stress_sf1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("STRESS_SF1_DIR", ".stress/sf1")
# smallest fixture, used only to warm codegen/Arrow workers before timing
SF_WARM = os.environ.get("STRESS_WARM_DIR", "/root/testdata/sf0.001")


def time_queries(spark, qs, sf_dir: str, passes: int = 2) -> dict[str, float]:
    # bench.py's checksum action, NOT count(): count() lets Catalyst
    # left-join-eliminate whole subtrees (a unique-keyed aggregate on
    # the right of a LEFT join is dropped entirely — clustering_coef's
    # triangle core measured 18s instead of 45s at sf1 under count();
    # STRESS.md r8) and prune projected expressions (VERDICT r6 #2).
    from bench import _force

    best: dict[str, float] = {}
    for _ in range(passes):
        for name in sorted(qs):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, dt), dt)
            spark.catalog.clearCache()
    return best


def main() -> None:
    spark = get_spark("stress-sf1")
    from ksql_query_tutorial_spark.plans.checks import formatted_plan
    from ksql_query_tutorial_spark.queries import TUTORIAL_QUERIES as qs
    from ksql_query_tutorial_spark.tables import TABLES, load

    # warm: footers + codegen/JIT/Arrow worker pool at the small sf
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue  # not part of the tutorial-query fixture
        load(spark, SF1, t).count()
    from bench import _force

    for name in sorted(qs):
        _force(qs[name](spark, SF_WARM))  # warm the SAME final stage the
        # timed checksum pass runs (count() compiles a different plan tail)
    spark.catalog.clearCache()

    t01 = time_queries(spark, qs, SF01)
    t1 = time_queries(spark, qs, SF1)

    print(f"\n{'query':32s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    worst = 0.0
    for name in sorted(qs):
        ratio = t1[name] / max(t01[name], 1e-9)
        worst = max(worst, ratio)
        print(f"{name:32s} {t01[name]:8.3f} {t1[name]:8.3f} {ratio:7.2f}")
    tot01, tot1 = sum(t01.values()), sum(t1.values())
    print(f"{'TOTAL':32s} {tot01:8.3f} {tot1:8.3f} {tot1 / tot01:7.2f}")
    print(f"worst per-query ratio: {worst:.2f} (linear = 10)")

    # bounded dims must still broadcast at sf1 (AQE must not flip the
    # region/nation joins to sort-merge as the fact side grows)
    for q in ("q14_inner_join", "q23_revenue_by_region"):
        plan = formatted_plan(qs[q](spark, SF1))
        assert "BroadcastHashJoin" in plan, f"{q} lost its broadcast at sf1:\n{plan}"
    print("broadcast check: q14/q23 keep BroadcastHashJoin at sf1")
    spark.stop()


if __name__ == "__main__":
    main()
