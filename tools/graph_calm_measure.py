"""Calm-window measurement for the graph clustering/triangles pair
(VERDICT r7 #3): was the 7.01s driver number for graph_clustering_coef
real (an r7 regression) or closing-window noise (builder CV max 0.44)?

Protocol: run bench.py's calibration set first and REFUSE to report if
the host is noisy (CV median > 0.15); then best-of-N for the pair at
sf0.1 with bench.py's exact forcing action; then one timed pass at the
10x sf1 fixture for the scale ratio. Usage:
    python tools/graph_calm_measure.py [--reps 3] [--skip-sf1]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIBRATION_QUERIES, _force  # noqa: E402
from ksql_query_tutorial_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("STRESS_SF1_DIR", ".stress/sf1")
SF_WARM = "/root/testdata/sf0.001"
PAIR = ["graph_clustering_coef", "graph_triangles"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-cv", type=float, default=0.15)
    ap.add_argument("--skip-sf1", action="store_true")
    args = ap.parse_args()

    spark = get_spark("graph-calm", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()

    from ksql_query_tutorial_spark.tables import load

    for t in ("documents",):
        load(spark, SF01, t).count()
    for name in CALIBRATION_QUERIES + PAIR:
        _force(qs[name](spark, SF_WARM))
    spark.catalog.clearCache()

    # 1. calm-window gate: bench.py's calibration queries, 5 reps
    samples: dict[str, list[float]] = {q: [] for q in CALIBRATION_QUERIES}
    for _ in range(5):
        for q in CALIBRATION_QUERIES:
            t0 = time.perf_counter()
            _force(qs[q](spark, SF01))
            samples[q].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    cvs = [statistics.stdev(v) / statistics.mean(v) for v in samples.values()]
    cv_med, cv_max = statistics.median(cvs), max(cvs)
    print(f"calibration: CV median {cv_med:.3f} max {cv_max:.3f}")
    if cv_med > args.max_cv:
        print("HOST NOISY — refuse to conclude; rerun in a calm window")
        return

    # 2. best-of-N at sf0.1, bench-identical action + clearCache
    for name in PAIR:
        best, all_t = None, []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF01))
            dt = time.perf_counter() - t0
            all_t.append(dt)
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(f"sf0.1 {name}: best {best:.2f}s  all {[round(t,2) for t in all_t]}")

    # 3. sf1 ratio (single timed pass after a warm pass)
    if not args.skip_sf1 and os.path.isdir(SF1):
        for name in PAIR:
            t0 = time.perf_counter()
            _force(qs[name](spark, SF1))
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            print(f"sf1   {name}: {dt:.2f}s")


if __name__ == "__main__":
    main()
