"""Same-tree A/B of the bench forcing action (VERDICT r6 #2).

Times every declared query at sf0.1 under BOTH actions —
old: ``df.count()`` (lets Catalyst prune unused projections),
new: ``sum(xxhash64(all columns))`` (consumes every output column) —
interleaved per query so host drift hits both sides equally, best-of-N
per side. Prints one JSON line with per-query old/new seconds and the
totals, so VERIFICATION.md can record the step change introduced when
bench.py switched actions.

Usage: python tools/bench_action_ab.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ksql_query_tutorial_spark.session import get_spark

    spark = get_spark(app_name="bench-action-ab", cpus=cpus)

    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    from ksql_query_tutorial_spark.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in sorted(qs):
        try:
            bench._force(qs[name](spark, warm_dir))
        except Exception:
            pass
    spark.catalog.clearCache()

    old: dict[str, float] = {}
    new: dict[str, float] = {}

    def run(name: str, action: str) -> None:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if action == "old":
            df.count()
        else:
            bench._force(df)
        el = round(time.perf_counter() - t0, 4)
        book = old if action == "old" else new
        book[name] = min(book.get(name, el), el)
        spark.catalog.clearCache()

    for _rep in range(reps):
        for name in sorted(qs):
            run(name, "old")
            run(name, "new")
        spark.sparkContext._jvm.System.gc()

    total_old = round(sum(old.values()), 2)
    total_new = round(sum(new.values()), 2)
    movers = sorted(
        ((n, old[n], new[n]) for n in qs),
        key=lambda t: t[2] - t[1],
        reverse=True,
    )[:12]
    print(json.dumps({
        "metric": "bench_action_ab",
        "sf_dir": sf_dir,
        "reps": reps,
        "total_old_count_action": total_old,
        "total_new_checksum_action": total_new,
        "ratio_new_over_old": round(total_new / total_old, 4),
        "largest_absolute_increases": [
            {"query": n, "old": o, "new": w} for n, o, w in movers
        ],
    }))


if __name__ == "__main__":
    main()
