"""Dump `.explain("formatted")` for named queries to plans/<dir>/.

Usage: python tools/dump_plans.py <dir> <suffix> <query> [<query>...]
Writes plans/<dir>/<query>_<suffix>.txt for each query at sf0.1.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_query_tutorial_spark.plans.checks import formatted_plan
from ksql_query_tutorial_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", outdir,
    )
    os.makedirs(root, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        path = os.path.join(root, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
