# exec()'d into the running REPL to (re)define timing helpers.
import time as _time


def t(df_or_fn):
    t0 = _time.perf_counter()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    _force(df)  # noqa: F821
    el = _time.perf_counter() - t0
    spark.catalog.clearCache()  # noqa: F821
    return round(el, 4)


def tq(name, n=3, sf=SF):  # noqa: F821
    fn = QS[name]  # noqa: F821
    _force(fn(spark, WARM))  # noqa: F821
    spark.catalog.clearCache()  # noqa: F821
    runs = [t(lambda: fn(spark, sf)) for _ in range(n)]  # noqa: F821
    print(f"{name}: best={min(runs)} {runs}", flush=True)
    return min(runs)


def ab(fns, n=3, warm=True):
    if warm:
        for f in fns.values():
            _force(f())  # noqa: F821
        spark.catalog.clearCache()  # noqa: F821
    runs = {k: [] for k in fns}
    for _ in range(n):
        for k, f in fns.items():
            runs[k].append(t(f))
    for k, v in runs.items():
        print(f"{k}: best={min(v)} {v}", flush=True)
    return {k: min(v) for k, v in runs.items()}
