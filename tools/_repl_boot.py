"""Bootstrap for the interactive profiling REPL (r9 optimization round).

Loads a session, the query registry, and timing helpers:
    t(df)          -> seconds for bench's forcing action on df
    tq(name, n=3)  -> best-of-n seconds for a declared query at sf0.1
    ab(fns, n=3)   -> interleaved best-of-n for {label: lambda->df}
    plan(df)       -> formatted plan string
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _force
from ksql_query_tutorial_spark.session import get_spark
from ksql_query_tutorial_spark.tables import load, TABLES
from pyspark.sql import functions as F  # noqa: F401

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

spark = get_spark(app_name="r09-profile-repl")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em  # noqa: E402

QS = em.queries()


def t(df_or_fn):
    """Time bench-equivalently: DataFrame CONSTRUCTION (when given a
    zero-arg callable — operators with driver loops run jobs there)
    plus the forcing action. bench.timed() times both."""
    t0 = time.perf_counter()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    _force(df)
    el = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(el, 4)


def tq(name, n=3, sf=SF):
    fn = QS[name]
    _force(fn(spark, WARM))
    spark.catalog.clearCache()
    runs = [t(lambda: fn(spark, sf)) for _ in range(n)]
    print(f"{name}: best={min(runs)} {runs}", flush=True)
    return min(runs)


def ab(fns, n=3, warm=True):
    """fns: dict label -> zero-arg callable returning a DataFrame.
    Interleaved: one run of each per rep. Prints best-of per label."""
    if warm:
        for f in fns.values():
            _force(f())
        spark.catalog.clearCache()
    runs = {k: [] for k in fns}
    for _ in range(n):
        for k, f in fns.items():
            runs[k].append(t(f))
    for k, v in runs.items():
        print(f"{k}: best={min(v)} {v}", flush=True)
    return {k: min(v) for k, v in runs.items()}


def plan(df):
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


print("REPL ready", flush=True)
