"""Isolated per-query profiler for the r9 optimization round.

Usage:
    python tools/profile_r09.py q1 q2 ...            # time best-of-N
    python tools/profile_r09.py --plans q1 q2 ...    # also dump
        .explain("formatted") to plans/r09/<name>_<tag>.txt
    python tools/profile_r09.py --tag after ...      # plan-file suffix

Timing methodology matches bench.py exactly (same _force checksum
action, same clearCache between runs) so numbers here are comparable
to bench numbers; REPS=3 best-of replicates its best-of-passes floor.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force  # noqa: E402

REPS = 3


def main() -> None:
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    args = [a for a in args if a != "--plans"]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ksql_query_tutorial_spark.session import get_spark

    spark = get_spark(app_name="profile-r09")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = args or sorted(qs)

    # warm: one pass at the smallest sf (codegen cache, Arrow workers)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        _force(qs[name](spark, warm_dir))
    spark.catalog.clearCache()

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            _force(df)
            times.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        if dump_plans:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        print(f"{name}: best={min(times):.3f} runs={times}", flush=True)


if __name__ == "__main__":
    main()
